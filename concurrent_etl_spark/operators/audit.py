"""Pipeline observability: observe()-based audit metrics.

The reference audits loads by re-querying the sink and printing
(``SELECT COUNT (ID) FROM ...Temp...`` then conditional log,
``case_2/Normal.py:280-282``) — an extra round trip per batch that
reads what was just written. Spark's ``observe`` collects metrics ON
the write pass itself: zero extra jobs, exact, and available from both
batch actions and streaming progress events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def audited(
    df: DataFrame,
    count_col: str | None = None,
    sum_col: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach an audit Observation to df.

    Returns (df', observation); after any action on df', call
    ``observation.get`` for {'rows', 'nonnull_<c>', 'sum_<c>'} — the
    reference's post-load COUNT audit without the second scan.
    """
    obs = Observation("audit")
    metrics = [F.count(F.lit(1)).alias("rows")]
    if count_col is not None:
        metrics.append(F.count(F.col(count_col)).alias(f"nonnull_{count_col}"))
    if sum_col is not None:
        metrics.append(
            F.sum(F.col(sum_col).cast("decimal(18,4)"))
            .cast("double")
            .alias(f"sum_{sum_col}")
        )
    return df.observe(obs, *metrics), obs


def expect_rows(observation: Observation, at_least: int = 1) -> None:
    """Raise if the audited action moved fewer rows than expected —
    the programmatic form of the reference's 'data fully loaded' /
    'there is no data loaded' log line."""
    rows = observation.get["rows"]
    if rows < at_least:
        raise AssertionError(
            f"audit: expected >= {at_least} rows, observed {rows}"
        )
