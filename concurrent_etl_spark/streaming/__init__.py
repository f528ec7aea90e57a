"""Structured Streaming surface (SURVEY.md §2.8, T1-T5).

The reference's polling micro-batch daemon (6-second sleep loop, done-set
diffing, temp-table reset, merge trigger — case_2/Normal.py:300-331)
maps onto Structured Streaming:

  * file discovery + exactly-once  -> file source + checkpointing (T2)
  * 6 s polling loop               -> trigger(processingTime='6 seconds') (T1)
  * bounded retry                  -> spark.task.maxFailures / restart (T3)
  * staging reset + merge signal   -> foreachBatch(stage -> merge) (T4)
  * graceful shutdown              -> query.stop() + checkpoint restart (T5)

Beyond the reference: event-time windows + watermarks over the
``events`` table (windows.py) — the reference only knew arrival time.
"""

from concurrent_etl_spark.streaming.file_stream import (
    file_stream_etl,
    foreach_batch_upsert,
)
from concurrent_etl_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "file_stream_etl",
    "foreach_batch_upsert",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
]
