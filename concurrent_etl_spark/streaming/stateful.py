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
