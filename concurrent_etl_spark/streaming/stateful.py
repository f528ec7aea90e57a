"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only cross-batch state is the filesystem done-set
(``case_2/Normal.py:304-323``). A real streaming engine needs
user-defined state that survives micro-batches and restarts; Spark's
contract for that is ``applyInPandasWithState`` (Arrow-batched pandas
per key-group + a GroupState handle backed by the checkpointed state
store).

Scale notes: state is partitioned by the grouping key across
executors, checkpointed incrementally (RocksDB state store in
production), and bounded either by key cardinality (running totals) or
explicit timeouts (sessionization evicts idle keys). Nothing lives on
the driver.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame

RUNNING_TOTALS_OUTPUT = (
    "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
)
RUNNING_TOTALS_STATE = "n bigint, total double, last_us bigint"


def _running_totals_fn(key, pdfs: Iterable[pd.DataFrame], state):
    """Fold each micro-batch's rows for one user into running state."""
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        if pd.notna(batch_max):
            us = int(batch_max.value // 1000)
            last_us = us if last_us is None else max(last_us, us)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else pd.NaT],
        }
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum, last-seen) across batches.

    Emits one updated row per user per micro-batch (update semantics);
    state persists in the checkpointed store, so a restarted query
    continues the totals instead of recounting — the capability the
    reference's daemon fundamentally lacks.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSIONS_OUTPUT = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
SESSIONS_STATE = "start_us bigint, end_us bigint, n bigint"


def _sessions_fn(gap_us: int, session_tz: str = "UTC"):
    def _rows(key, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]] * len(sessions),
                # tz-aware UTC out: Arrow converts to the session
                # timezone itself, so the emitted bounds line up
                # with the UTC epochs kept in state under any tz
                "session_start": [
                    pd.Timestamp(s * 1000, tz="UTC") for s, _, _ in sessions
                ],
                "session_end": [
                    pd.Timestamp(e * 1000, tz="UTC") for _, e, _ in sessions
                ],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def fn(key, pdfs: Iterable[pd.DataFrame], state):
        """Event-time sessionization, gap-split INSIDE the fold: the
        incoming batch is merged with the open-session state and cut
        into runs wherever consecutive event times are more than
        ``gap`` apart. Every run except the last is a CLOSED session
        (a later event proves the gap) and is emitted immediately;
        only the last run stays in state, closed later either by a
        subsequent batch or by the event-time timeout once the
        WATERMARK passes last-event + gap. Splitting in the fold —
        not only at timeouts — makes the emitted session set a pure
        function of the event times, independent of how the stream
        was micro-batched (a timeout-only fold would merge any two
        sessions that land in one batch). Emission is append-only:
        closed sessions are immutable facts."""
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield _rows(key, [(start_us, end_us, n)])
            return
        points: list[int] = []
        for pdf in pdfs:
            # Arrow hands timestamps over rendered in the SESSION
            # timezone as tz-naive; setTimeoutTimestamp compares
            # against the UTC-based watermark, so localize to the
            # session tz and convert to UTC before taking epoch — a
            # non-UTC spark.sql.session.timeZone would otherwise
            # close sessions early/late by the tz offset.
            ts = pdf["ts"]
            if ts.dt.tz is None:
                ts = ts.dt.tz_localize(session_tz)
            points.extend(
                (ts.dt.tz_convert("UTC").astype("int64") // 1000).tolist()
            )
        points.sort()
        cur = tuple(state.get) if state.exists else None
        closed: list[tuple[int, int, int]] = []
        for t in points:
            if cur is None:
                cur = (t, t, 1)
            elif t <= cur[1] + gap_us:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (t, t, 1)
        if closed:
            yield _rows(key, closed)
        if cur is not None:
            state.update(cur)
            # close when the watermark passes last activity + gap
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        return
        yield  # pragma: no cover - make fn a generator

    return fn


def user_sessions_event_timeout(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows as custom state with EVENT-TIME timeouts: the
    applyInPandasWithState form of sessionization (vs the batch
    lag-cumsum and the built-in session_window aggregation the
    catalog also ships). Differences that matter at scale: state is
    one row per OPEN session (idle keys are evicted by the timeout,
    so state never grows with history), closes are driven by the
    watermark — deterministic under replay, no wall clock — and the
    output stream carries only immutable closed sessions (append
    mode), which is what a downstream sink wants to ingest
    exactly-once.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    session_tz = events.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessions_fn(gap_us, session_tz),
            outputStructType=SESSIONS_OUTPUT,
            stateStructType=SESSIONS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

DEDUP_OUTPUT = "event_id bigint, user_id bigint, value double"


def _twsp_available() -> bool:
    """transformWithStateInPandas needs google.protobuf in the Python
    workers (its state-server protocol is protobuf-encoded); this
    container does not ship it. Same detect-if-available pattern as
    the PIL/soundfile codec hooks — the API path activates unchanged
    on environments that have it."""
    try:  # pragma: no cover - depends on environment
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def dedupe_events_ttl(
    events: DataFrame, ttl_minutes: int | None = 60
) -> DataFrame:
    """Cross-batch streaming deduplication with TTL-bounded state,
    on Spark 4's ``transformWithStateInPandas`` — the successor API
    to ``applyInPandasWithState`` (typed state handles, composable
    ValueState/ListState/MapState, per-state TTL) and the third
    point on the engine's custom-state surface (§2.9). Requires
    google.protobuf in the workers (``_twsp_available``); the
    functionally-equivalent ``dedupe_events_state`` below runs the
    same semantics on the prior-generation API everywhere.

    Semantics: the FIRST occurrence of each event_id passes, every
    replay within the TTL window is dropped — the at-least-once →
    exactly-once adapter in front of any non-idempotent sink (the
    reference's done-set, case_2/Normal.py:304-323, is this exact
    operator at file granularity, unbounded). ``dropDuplicates`` on
    a stream keeps state forever (or needs a watermark column);
    here the ValueState carries its own TTL, so state size tracks
    the ttl-window's distinct-key cardinality — the knob that makes
    a 100 TB/day feed's dedup state a bounded RocksDB footprint
    instead of an unbounded one. ``ttl_minutes=None`` disables
    expiry (exact dedup, unbounded state — caller's choice).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        BooleanType,
        StructField,
        StructType,
    )

    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60_000

    class DedupProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType([StructField("seen", BooleanType())])
            self._seen = handle.getValueState("seen", schema, ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            if self._seen.exists():
                # replay of a key already emitted inside the TTL
                # window: drop every row
                for _ in rows:
                    pass
                return
            first = None
            for pdf in rows:
                if len(pdf) and first is None:
                    first = pdf.iloc[[0]][["event_id", "user_id", "value"]]
            if first is not None:
                self._seen.update((True,))
                yield first

        def close(self) -> None:
            pass

    return (
        events.select("event_id", "user_id", "value")
        .groupBy("event_id")
        .transformWithStateInPandas(
            DedupProcessor(),
            outputStructType=DEDUP_OUTPUT,
            outputMode="Append",
            timeMode="None",
        )
    )


DEDUP_STATE = "seen boolean"


def dedupe_events_state(
    events: DataFrame, ttl_minutes: int | None = 60
) -> DataFrame:
    """The same TTL-bounded streaming dedup on the prior-generation
    ``applyInPandasWithState`` API (no extra worker deps): first
    occurrence per event_id is emitted, cross-batch replays are
    swallowed by the checkpointed per-key flag, and a processing-time
    timeout evicts idle keys so state size tracks the TTL window's
    distinct-key cardinality, not history. The at-least-once →
    exactly-once adapter in front of a non-idempotent sink; the
    reference's done-set (case_2/Normal.py:304-323) is this operator
    at file granularity with no eviction.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    ttl_ms = None if ttl_minutes is None else ttl_minutes * 60_000

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            # TTL expiry: evict the flag; the key can be emitted
            # again if it ever reappears (bounded-state trade)
            state.remove()
            return
        already = state.exists
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][["event_id", "user_id", "value"]]
        if not already:
            state.update((True,))
        if ttl_ms is not None:
            # after update() so state exists (the API precondition);
            # re-arming on replays makes the TTL idle-based
            state.setTimeoutDuration(ttl_ms)
        if not already and first is not None:
            yield first

    return (
        events.select("event_id", "user_id", "value")
        .groupBy("event_id")
        .applyInPandasWithState(
            fn,
            outputStructType=DEDUP_OUTPUT,
            stateStructType=DEDUP_STATE,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.NoTimeout
                if ttl_ms is None
                else GroupStateTimeout.ProcessingTimeTimeout
            ),
        )
    )
