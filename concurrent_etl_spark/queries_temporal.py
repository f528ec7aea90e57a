"""Temporal join queries over the events table (operators/temporal.py).

The reference joins only on equality keys (SURVEY §2.3); these cover
the two time-axis join shapes every event warehouse needs, in their
scale-safe formulations (union-scan as-of, bucketed range join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# interval analytics: sweep-line concurrency + gaps-and-islands merge
# ---------------------------------------------------------------------------

#: deterministic synthetic interval length for the events table:
#: 1..600 s keyed on event_id (the fixture has point events only; a
#: real deployment carries its own end column and drops this line).
_DUR_US = "(1 + event_id % 600) * 1000000"


@query(
    "max_concurrency_sweep",
    oracle=f"""
    WITH iv AS (
      SELECT event_type,
             CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day,
             epoch_us(ts) AS s_us,
             epoch_us(ts) + {_DUR_US} AS e_us,
             event_id
      FROM events),
    pts AS (
      SELECT event_type, day, s_us AS t, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT event_type, day, e_us AS t, -1 AS delta, event_id FROM iv),
    run AS (
      SELECT event_type, day,
             CAST(SUM(delta) OVER (PARTITION BY event_type, day
                                   ORDER BY t, delta, event_id
                                   ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS open_now
      FROM pts)
    SELECT event_type, day,
           MAX(open_now) AS max_concurrent,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
    FROM run GROUP BY event_type, day
    """,
)
def q_max_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line maximum concurrency — the 'peak simultaneous
    sessions' operator (capacity planning, license counting, ad
    break overlap). Each interval contributes a +1 at its start and
    a -1 at its (exclusive) end; the running sum over the merged
    endpoint stream is the number of open intervals, and its max per
    cohort is the answer. Ordering ``(t, delta, ...)`` puts the -1
    before the +1 at equal timestamps, giving exact [start, end)
    semantics; the max is invariant to tie permutations beyond that.

    Cohort = (event_type, start-day), which is also the partition
    key of the window — never a global window. At 100 TB the day
    dimension is what keeps every sweep partition bounded (one
    cohort's endpoints per task); a deployment needing cross-day
    concurrency adds boundary-clipped interval fragments per day,
    which changes only the interval-generation select.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + (1 + F.col("event_id") % 600) * 1_000_000)
        .alias("e_us"),
        "event_id",
    )
    pts = iv.select(
        "event_type", "day", F.col("s_us").alias("t"),
        F.lit(1).alias("delta"), "event_id",
    ).unionByName(
        iv.select(
            "event_type", "day", F.col("e_us").alias("t"),
            F.lit(-1).alias("delta"), "event_id",
        )
    )
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select(
        "event_type", "day",
        F.sum("delta").over(w).cast("bigint").alias("open_now"),
    )
    return run.groupBy("event_type", "day").agg(
        F.max("open_now").alias("max_concurrent"),
        (F.count("*") / 2).cast("bigint").alias("n_intervals"),
    )


@query(
    "interval_islands_merge",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS s_us,
             epoch_us(ts) + {_DUR_US} AS e_us
      FROM events),
    flagged AS (
      SELECT user_id, s_us, e_us,
             CASE WHEN MAX(e_us) OVER (PARTITION BY user_id
                                       ORDER BY s_us, e_us, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) IS NULL
                       OR s_us > MAX(e_us) OVER (PARTITION BY user_id
                                       ORDER BY s_us, e_us, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island,
             event_id
      FROM iv),
    isl AS (
      SELECT user_id, s_us, e_us,
             CAST(SUM(new_island) OVER (PARTITION BY user_id
                                        ORDER BY s_us, e_us, event_id
                                        ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS island_id
      FROM flagged),
    merged AS (
      SELECT user_id, island_id,
             MIN(s_us) AS island_s, MAX(e_us) AS island_e
      FROM isl GROUP BY user_id, island_id)
    SELECT user_id,
           COUNT(*) AS n_islands,
           CAST(SUM(island_e - island_s) AS BIGINT) AS covered_us,
           CAST(MAX(island_e - island_s) AS BIGINT) AS longest_us
    FROM merged GROUP BY user_id
    """,
)
def q_interval_islands_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merging: per user, overlapping or
    touching [start, end) intervals coalesce into maximal covered
    'islands' (union of intervals), reported as island count, total
    covered time, and longest island — the utilization/uptime
    operator (distinct from ``sessionize_gap_cumsum``, which
    clusters POINT events by inter-event gap; here the inputs carry
    duration and the union is exact).

    Classic two-window idiom: a running MAX of prior interval ends
    detects island starts (an interval whose start exceeds every
    prior end opens a new island), a running SUM of those flags
    numbers the islands. Both windows partition on user_id — no
    global window, fully parallel across users; integer microsecond
    arithmetic end-to-end.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + (1 + F.col("event_id") % 600) * 1_000_000)
        .alias("e_us"),
    )
    order = ["s_us", "e_us", "event_id"]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max("e_us").over(w_prev)
    flagged = iv.select(
        "user_id", "s_us", "e_us", "event_id",
        F.when(prev_end.isNull() | (F.col("s_us") > prev_end), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    isl = flagged.select(
        "user_id", "s_us", "e_us",
        F.sum("new_island").over(w_run).cast("bigint").alias("island_id"),
    )
    merged = isl.groupBy("user_id", "island_id").agg(
        F.min("s_us").alias("island_s"), F.max("e_us").alias("island_e")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum(F.col("island_e") - F.col("island_s"))
        .cast("bigint")
        .alias("covered_us"),
        F.max(F.col("island_e") - F.col("island_s"))
        .cast("bigint")
        .alias("longest_us"),
    )


# ---------------------------------------------------------------------------
# cogrouped-map as-of merge (the cogroup().applyInPandas API surface)
# ---------------------------------------------------------------------------

def _asof_merge_cogroup(left: "pd.DataFrame", right: "pd.DataFrame"):
    """Per-BUCKET pandas as-of merge: latest click at or before each
    purchase for every user in the bucket, ties broken toward the
    highest event_id. One vectorized ``merge_asof(by="user_id")``
    replaces the per-user call: sorting both slices (ts, event_id)
    makes backward/allow_exact pick the max-(ts, event_id) qualifying
    click per user — identical semantics to the per-user form, but
    the Python-call count drops from |users| to |buckets| (guide §4:
    amortize the per-call boundary cost over a whole batch)."""
    import pandas as pd

    if left.empty:
        return pd.DataFrame(
            columns=[
                "user_id", "event_id", "ts", "prior_event_id", "prior_ts",
            ]
        )
    left = left.sort_values(["ts", "event_id"]).reset_index(drop=True)
    if right.empty:
        out = left[["user_id", "event_id", "ts"]].copy()
        out["prior_event_id"] = pd.array([None] * len(out), dtype="Int64")
        out["prior_ts"] = pd.NaT
        return out
    right = (
        right.sort_values(["ts", "event_id"])
        .rename(columns={"event_id": "prior_event_id", "ts": "prior_ts"})
        .reset_index(drop=True)[["user_id", "prior_ts", "prior_event_id"]]
    )
    merged = pd.merge_asof(
        left[["user_id", "event_id", "ts"]],
        right,
        left_on="ts",
        right_on="prior_ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    merged["prior_event_id"] = merged["prior_event_id"].astype("Int64")
    return merged[["user_id", "event_id", "ts", "prior_event_id", "prior_ts"]]


@query(
    "cogroup_asof_merge",
    oracle="""
    SELECT l.user_id, l.event_id, l.ts, p.prior_event_id, p.prior_ts
    FROM (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase') l
    LEFT JOIN LATERAL (
      SELECT r.event_id AS prior_event_id, r.ts AS prior_ts
      FROM events r
      WHERE r.event_type = 'click' AND r.user_id = l.user_id
        AND r.ts <= l.ts
      ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) p ON true
    """,
)
def q_cogroup_asof_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COGROUPED-map Python boundary (``groupby(k).cogroup(
    other.groupby(k)).applyInPandas``) — the last of Spark's Arrow
    batch APIs next to pandas_udf / applyInPandas / mapInPandas /
    mapInArrow / UDTF / applyInPandasWithState, exercised on the
    workload it exists for: both sides shuffle ONCE on the group
    key, then each user's purchase and click slices arrive TOGETHER
    in one pandas call where a sequential ``merge_asof`` runs — the
    shape for per-key logic that needs both inputs at once and is
    awkward as a join (here it IS expressible relationally, which is
    what makes it oracle-checkable: same answer as the
    ``asof_join_prior_click`` union-scan and the oracle's LATERAL).

    Scale: the cogroup key is a deterministic USER BUCKET
    (pmod(xxhash64(user_id), B)), not the raw user_id — cogrouped-map
    invokes the pandas function once per distinct key, so keying by
    user paid the fixed pandas-call cost |users| times (measured
    13.4 -> 1.4 s at sf0.1 for ~1500 users); inside a bucket one
    vectorized ``merge_asof(by="user_id")`` keeps the per-user
    semantics exactly. B derives from the input size estimate
    (~16 MB of events per bucket, floored at the session's
    parallelism) so task memory stays bounded at 100 TB while small
    runs still fill every core — never a constant tuned to either.
    Ties broken identically to the relational form (ts, then
    event_id, backward)."""
    ev = load_table(spark, sf_dir, "events")
    est_bytes = int(
        ev._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    n_buckets = max(
        spark.sparkContext.defaultParallelism,
        est_bytes // (16 * 1024 * 1024),
    )
    bucket = F.pmod(F.xxhash64("user_id"), F.lit(n_buckets))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    return (
        purchases.groupBy(bucket)
        .cogroup(clicks.groupBy(bucket))
        .applyInPandas(
            _asof_merge_cogroup,
            schema=(
                "user_id bigint, event_id bigint, ts timestamp, "
                "prior_event_id bigint, prior_ts timestamp"
            ),
        )
    )


@query(
    "scd2_point_in_time_join",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'signup'),
    d AS (
      SELECT user_id, ts AS valid_from,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT)
               AS version,
             value AS state_value,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM s),
    p AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'purchase')
    SELECT p.user_id, p.event_id, p.ts, p.value AS amount,
           d.version, d.state_value, d.valid_from, d.valid_to
    FROM p LEFT JOIN d
      ON p.user_id = d.user_id
     AND p.ts >= d.valid_from
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    """,
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase picks up the SCD2 dimension
    version (built from signup events: versioned [valid_from,
    valid_to) intervals per user) that was valid AT the purchase
    timestamp — the warehouse-standard "fact against
    slowly-changing-dimension history" lookup.

    Spark side avoids the interval join entirely: validity intervals
    are by construction non-overlapping per user, so "the version
    whose interval contains ts" == "the latest version starting at
    or before ts" — the O(n log n) union-scan as-of merge (one
    shuffle on user_id). The oracle states the semantics the
    classical way, as an explicit BETWEEN-interval LEFT JOIN —
    including the zero-width-interval edge (two signups at one
    timestamp: the superseded version matches nothing; the as-of
    tie-break picks the same survivor).

    At 100 TB an interval join would need a range-bucketed or
    broadcast strategy; the as-of reformulation needs neither — it
    is the same single hash shuffle regardless of version count.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        ev.where(F.col("event_type") == "signup")
        .select("user_id", "ts", "event_id", "value")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.row_number().over(w).cast("bigint").alias("version"),
            F.col("value").alias("state_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", F.col("value").alias("amount")
    )
    joined = asof_join(
        purchases,
        dim,
        on="user_id",
        ts_col="ts",
        right_id="event_id",
        right_vals=["version", "state_value", "valid_from", "valid_to"],
        prefix="v_",
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        "amount",
        F.col("v_version").alias("version"),
        F.col("v_state_value").alias("state_value"),
        F.col("v_valid_from").alias("valid_from"),
        F.col("v_valid_to").alias("valid_to"),
    )


#: CUSUM alarm threshold in value units (the events `value` column
#: runs 0..~330 with mean ~50; per-user mean drift of ~10 units over
#: tens of events crosses 200 while noise does not).
_CUSUM_H = 200


@query(
    "cusum_mean_shift",
    oracle=f"""
    WITH g AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,4)) AS n,
             SUM(CAST(value AS DECIMAL(18,4))) AS tot
      FROM events),
    s AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id,
             g.n * CAST(value AS DECIMAL(18,4)) - g.tot AS d,
             g.n AS n
      FROM events, g),
    p AS (
      SELECT user_id, t_us, event_id, n,
             SUM(d) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS pf
      FROM s),
    c AS (
      SELECT user_id, n,
             pf - MIN(pf) OVER w AS cu_pos,
             MAX(pf) OVER w - pf AS cu_neg
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id
                   ROWS UNBOUNDED PRECEDING))
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE cu_pos > {_CUSUM_H} * n) AS BIGINT)
             AS n_alarms_up,
           CAST(COUNT(*) FILTER (WHERE cu_neg > {_CUSUM_H} * n) AS BIGINT)
             AS n_alarms_down,
           CAST(MAX(cu_pos) * 10000 AS BIGINT) // CAST(MIN(n) AS BIGINT)
             AS max_cusum_up_e4,
           CAST(MAX(cu_neg) * 10000 AS BIGINT) // CAST(MIN(n) AS BIGINT)
             AS max_cusum_down_e4
    FROM c GROUP BY user_id
    """,
)
def q_cusum_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM mean-shift detection per user (Page 1954 —
    the classic sequential changepoint statistic): the running
    deviation-from-global-mean sum, reset at its running extremum.
    The textbook recurrence S_k = max(0, S_{{k-1}} + d_k) looks
    sequential, but the prefix-min identity S_k = P_k - min_{{j<=k}}
    P_j turns it into TWO stacked partitioned window scans — no
    recursion, no applyInPandas, fully parallel across users.

    Division-free exactness: deviations are scaled by the global
    count (d = n*x - total, all DECIMAL multiplication — no mean
    division anywhere), so every cumulative value is exact and the
    alarm comparison n-scales the threshold. Even the reported maxima
    stay integer-exact: value-units x 1e4, via truncating division of
    nonnegative integers (floor == truncate on both engines) — a
    6-dp double round here measurably hit a half-way tie at sf0.1.
    DECIMAL(38,4) headroom bounds the n-scaled prefix sums up to
    n ~ 1e15 events; beyond that production drops the n-scaling for
    one exact mean division.

    Shape at 100 TB: one 2-row-aggregate scan for (n, total), one
    shuffle on user_id, then windows ordered within each user
    partition; alarms and maxima are a map-side-combinable rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.agg(
        F.count(F.lit(1)).cast("decimal(38,4)").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("tot"),
    )
    s = ev.crossJoin(F.broadcast(g)).select(
        "user_id",
        "ts",
        "event_id",
        "n",
        (F.col("n") * F.col("value").cast("decimal(18,4)") - F.col("tot")).alias(
            "d"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = s.withColumn("pf", F.sum("d").over(w))
    c = p.select(
        "user_id",
        "n",
        (F.col("pf") - F.min("pf").over(w)).alias("cu_pos"),
        (F.max("pf").over(w) - F.col("pf")).alias("cu_neg"),
    )
    h = F.lit(_CUSUM_H) * F.col("n")
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum((F.col("cu_pos") > h).cast("long")).cast("bigint").alias(
            "n_alarms_up"
        ),
        F.sum((F.col("cu_neg") > h).cast("long")).cast("bigint").alias(
            "n_alarms_down"
        ),
        F.expr(
            "CAST(max(cu_pos) * 10000 AS BIGINT)"
            " div CAST(min(n) AS BIGINT)"
        ).alias("max_cusum_up_e4"),
        F.expr(
            "CAST(max(cu_neg) * 10000 AS BIGINT)"
            " div CAST(min(n) AS BIGINT)"
        ).alias("max_cusum_down_e4"),
    )


@query(
    "twap_time_weighted",
    oracle="""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS t_us, event_id,
             CAST(value AS DECIMAL(18,4)) AS v
      FROM events),
    w AS (
      SELECT user_id, v,
             lead(t_us) OVER (PARTITION BY user_id
                              ORDER BY t_us, event_id) - t_us AS dt_us
      FROM s),
    h AS (SELECT user_id, v, dt_us FROM w WHERE dt_us IS NOT NULL),
    a AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_holds,
             CAST(SUM(dt_us) AS BIGINT) AS held_us,
             SUM(v * dt_us) AS vt
      FROM h GROUP BY user_id)
    SELECT user_id, n_holds, held_us,
           CAST(CAST(vt * 10000 AS HUGEINT) // held_us AS BIGINT) AS twap_e4
    FROM a
    """,
)
def q_twap_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP — the telemetry /
    market-data aggregate where each observation holds until the next
    one): every event's value is weighted by the microseconds until
    the user's next event, and the ratio is reported as an exact
    e4-scaled integer (truncating division of nonnegative exact
    operands — the same division-free convention as
    ``cusum_mean_shift``; a float ratio here is a tie hazard). The
    last observation per user has no holding interval and is
    excluded, as in any left-closed TWAP.

    Shape at 100 TB: one shuffle on user_id, a lead() in the
    per-user window, then a map-side-combinable rollup. The decimal
    weight products are exact (value scale 4 x integer µs), so the
    distributed sum is order-invariant.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    wn = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    h = (
        s.withColumn("dt_us", F.lead("t_us").over(wn) - F.col("t_us"))
        .where(F.col("dt_us").isNotNull())
    )
    a = h.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_holds"),
        F.sum("dt_us").cast("bigint").alias("held_us"),
        F.sum(F.col("v") * F.col("dt_us")).alias("vt"),
    )
    return a.select(
        "user_id",
        "n_holds",
        "held_us",
        F.expr(
            "CAST(vt * 10000 AS DECIMAL(38,0)) div held_us"
        ).cast("bigint").alias("twap_e4"),
    )
