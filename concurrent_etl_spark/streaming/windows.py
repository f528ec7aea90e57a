"""Event-time windowed aggregation with watermarks (§2.8 extension).

The reference had no notion of event time (files arrive, rows have
dates, but 'time' is only the 6 s polling clock). The engine adds the
full Structured Streaming window surface over the ``events`` table:
tumbling, sliding, and session windows, watermarked for bounded state.

Each function works on BOTH a batch DataFrame (for oracle-checked
correctness — window() is an ordinary function) and a streaming
DataFrame (where the watermark actually gates state eviction). At
100 TB-scale streaming the watermark is what keeps state finite:
state size ~ (#keys x windows inside watermark), independent of
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Non-overlapping event-time buckets: count + sum(value) per type."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window_size).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping windows: each event lands in size/slide windows."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window_size, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user: a session closes after `gap` idle time.

    Batch semantics are oracle-checkable with the classic gaps-and-
    islands SQL (lag + cumulative sum of new-session flags).
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )
