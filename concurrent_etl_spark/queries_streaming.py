"""Windowed event-time queries (streaming surface, batch-checked).

The window operators in streaming/windows.py run identically on batch
and streaming DataFrames; registering their batch form here gives the
oracle-checked correctness gate, while tests/test_streaming.py drives
the same operators through an actual readStream with checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from concurrent_etl_spark.catalog import query
from concurrent_etl_spark.engine import load_table
from concurrent_etl_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


@query(
    "tumbling_window_full",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_tumbling_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows with start+end bounds (T1 analogue)."""
    return tumbling_window_agg(load_table(spark, sf_dir, "events"))


@query(
    "sliding_window",
    oracle="""
    WITH slid AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts)
               - (k.k * INTERVAL 30 MINUTE) AS window_start,
             event_type
      FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS k) k)
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type, COUNT(*) AS n_events
    FROM slid GROUP BY 1, 2, 3
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30min windows — each event lands in 2 windows."""
    return sliding_window_agg(load_table(spark, sf_dir, "events"))


@query(
    "session_window",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, user_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o)
    SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start, user_id,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10 min gap) per user; oracle = gaps-and-islands."""
    return session_window_agg(load_table(spark, sf_dir, "events"))


@query(
    "stream_attribution_join",
    oracle="""
    WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
               FROM events WHERE event_type = 'click')
    SELECT v.user_id, v.view_ts, c.click_ts, v.view_id, c.click_id
    FROM v JOIN c ON v.user_id = c.user_id
               AND c.click_ts > v.view_ts
               AND c.click_ts <= v.view_ts + INTERVAL 1 HOUR
    """,
)
def q_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (click to the views it follows within 1h) — the
    batch form of the watermarked stream-stream attribution join; the
    streaming path with bounded two-sided state is e2e-tested in
    tests/test_streaming.py."""
    from concurrent_etl_spark.streaming.windows import (
        stream_stream_attribution_join,
    )

    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return stream_stream_attribution_join(views, clicks)
