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


def stream_stream_attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    *,
    key: str = "user_id",
    view_ts: str = "view_ts",
    click_ts: str = "click_ts",
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval join: click -> preceding view.

    The attribution shape (impression joined to the click that follows
    it within the window). Both sides are watermarked so each side's
    buffered state is bounded: a view can be dropped once the click
    watermark passes view_ts + attribution_window, and symmetric for
    clicks — without both watermarks + the time bound, stream-stream
    join state grows without limit. Works identically on batch frames
    (no watermark applied) for oracle checking.

    State at 100 TB-scale streaming: partitioned by join key, size
    ~ events inside (watermark + attribution window) per key — a
    function of rates, not of stream length.
    """
    return _attribution_join(
        views, clicks, "inner", key, view_ts, click_ts,
        attribution_window, watermark,
    )


def stream_stream_attribution_left_outer(
    views: DataFrame,
    clicks: DataFrame,
    *,
    key: str = "user_id",
    view_ts: str = "view_ts",
    click_ts: str = "click_ts",
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The OUTER half of attribution: every view emits — matched
    views with their click, UNMATCHED views with NULL click columns.
    On a stream the null row for an unmatched view can only be
    emitted once the click-side watermark proves no match can still
    arrive (view_ts + window < watermark) — which is exactly why the
    time-bound + both-side watermarks are mandatory for outer
    stream-stream joins (Spark rejects the query otherwise), not
    just a state-size optimization as in the inner case. The
    conversion-rate denominator lives in this operator: inner-join
    attribution alone cannot distinguish 'no click' from 'not yet'.
    """
    return _attribution_join(
        views, clicks, "left_outer", key, view_ts, click_ts,
        attribution_window, watermark,
    )


def _attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    how: str,
    key: str,
    view_ts: str,
    click_ts: str,
    attribution_window: str,
    watermark: str,
) -> DataFrame:
    v = views.withWatermark(view_ts, watermark) if views.isStreaming else views
    c = clicks.withWatermark(click_ts, watermark) if clicks.isStreaming else clicks
    cond = (
        (v[key] == c[key])
        & (c[click_ts] > v[view_ts])
        & (c[click_ts] <= F.expr(f"{view_ts} + INTERVAL {attribution_window}"))
    )
    return v.join(c, cond, how).select(
        v[key].alias("user_id"),
        v[view_ts].alias("view_ts"),
        c[click_ts].alias("click_ts"),
        v["view_id"].alias("view_id"),
        c["click_id"].alias("click_id"),
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """At-least-once -> effectively-once: drop key-duplicates whose
    event times fall within the watermark of the first occurrence.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes (bounded), unlike streaming
    ``dropDuplicates`` whose key set grows forever — the difference
    between a restartable 100 TB ingest and an OOM. On batch frames
    falls back to plain dropDuplicates for oracle comparison.
    """
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


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
