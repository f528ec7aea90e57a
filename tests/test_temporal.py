"""Edge-semantics tests for the temporal join operators.

The oracle gate checks these on real data; the cases here pin the
boundary semantics the oracle can't isolate: same-instant as-of ties,
null right-payload carry, bucket-boundary range matches.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from concurrent_etl_spark.operators.temporal import asof_join, range_join_pairs


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, value double"
    )


def test_asof_same_instant_and_tiebreak(spark):
    left = _mk(spark, [(1, _ts("2024-01-01T10:00:00"), 100, 5.0)])
    right = _mk(
        spark,
        [
            # two clicks at the same instant as the purchase: both are
            # "at-or-before"; the greater event_id must win
            (1, _ts("2024-01-01T10:00:00"), 7, 1.0),
            (1, _ts("2024-01-01T10:00:00"), 9, 2.0),
            (1, _ts("2024-01-01T09:00:00"), 8, 3.0),
        ],
    )
    row = asof_join(
        left, right, on="user_id", ts_col="ts", right_id="event_id",
        right_vals=["value"],
    ).collect()[0]
    assert row.prior_event_id == 9
    assert row.prior_value == 2.0


def test_asof_no_prior_and_null_payload(spark):
    left = _mk(
        spark,
        [
            (1, _ts("2024-01-01T08:00:00"), 100, 5.0),  # before any right
            (1, _ts("2024-01-01T12:00:00"), 101, 6.0),  # after null-value click
        ],
    )
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01T09:00:00"), 7, 1.0),
            # latest click has a NULL value: must be carried as the
            # match (not skipped back to event 7)
            (1, _ts("2024-01-01T11:00:00"), 8, None),
        ],
    )
    rows = {
        r.event_id: r
        for r in asof_join(
            left, right, on="user_id", ts_col="ts", right_id="event_id",
            right_vals=["value"],
        ).collect()
    }
    assert rows[100].prior_event_id is None
    assert rows[100].prior_value is None
    assert rows[101].prior_event_id == 8
    assert rows[101].prior_value is None


def test_asof_is_per_key(spark):
    left = _mk(spark, [(1, _ts("2024-01-01T10:00:00"), 100, 5.0)])
    right = _mk(spark, [(2, _ts("2024-01-01T09:00:00"), 7, 1.0)])
    row = asof_join(
        left, right, on="user_id", ts_col="ts", right_id="event_id",
        right_vals=["value"],
    ).collect()[0]
    assert row.prior_event_id is None  # other user's click never leaks


def test_range_join_bucket_boundary(spark):
    # events straddle a 3600s bucket boundary (10:59:59 -> 11:00:01):
    # the cross-bucket probe must still find the pair
    ev = _mk(
        spark,
        [
            (1, _ts("2024-01-01T10:59:59"), 1, 0.0),
            (1, _ts("2024-01-01T11:00:01"), 2, 0.0),
            (1, _ts("2024-01-01T13:00:00"), 3, 0.0),  # out of range of both
            (2, _ts("2024-01-01T11:00:00"), 4, 0.0),  # other user
        ],
    )
    pairs = {
        (r.event_a, r.event_b): r.lag_ms
        for r in range_join_pairs(ev, window_s=3600).collect()
    }
    assert pairs == {(1, 2): 2000}


def test_range_join_window_is_half_open(spark):
    ev = _mk(
        spark,
        [
            (1, _ts("2024-01-01T10:00:00"), 1, 0.0),
            (1, _ts("2024-01-01T11:00:00"), 2, 0.0),  # exactly +window: excluded
            (1, _ts("2024-01-01T10:59:59.999"), 3, 0.0),  # inside
        ],
    )
    pairs = sorted(
        (r.event_a, r.event_b)
        for r in range_join_pairs(ev, window_s=3600).collect()
    )
    assert pairs == [(1, 3), (3, 2)]


def test_ivf_probes_only_nearest_lists(spark):
    """IVF result for a query must equal brute force restricted to the
    probed clusters — and with enough probes equals exact brute force."""
    from concurrent_etl_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 2)
    full = ivf_topk(emb, queries, n_centroids=4, nprobe=4, k=5)
    exact = brute_force_topk(emb, queries, k=5)
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id) for r in full.collect()
    )
    want = sorted(
        (r.query_id, r.rank, r.neighbor_id) for r in exact.collect()
    )
    assert got == want  # probing every list == exact search


class TestTemporalPlanShape:
    """The scale claims are plan properties — assert them."""

    def test_range_join_never_nested_loop(self, spark, tables):
        from concurrent_etl_spark.plans.explain import plan_string

        plan = plan_string(
            range_join_pairs(tables["events"], window_s=3600), mode="simple"
        )
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_asof_join_single_key_shuffle(self, spark, tables):
        from concurrent_etl_spark.plans.explain import plan_string

        ev = tables["events"]
        df = asof_join(
            ev.where(F.col("event_type") == "purchase").select(
                "user_id", "ts", "event_id", "value"
            ),
            ev.where(F.col("event_type") == "click").select(
                "user_id", "ts", "event_id", "value"
            ),
            on="user_id", ts_col="ts", right_id="event_id",
            right_vals=["ts", "value"],
        )
        plan = plan_string(df, mode="simple")
        # one hash shuffle for the window, no join operator at all
        assert "Join" not in plan, plan
        assert plan.count("hashpartitioning(user_id") == 1, plan

    def test_ivf_broadcasts_centroids(self, spark, tables):
        from concurrent_etl_spark.operators.similarity import ivf_topk
        from concurrent_etl_spark.plans.explain import plan_string

        emb = tables["embeddings"]
        plan = plan_string(
            ivf_topk(emb, emb.where(F.col("vec_id") < 2)), mode="simple"
        )
        # centroid cross joins must be broadcast, never a shuffled cartesian
        assert "CartesianProduct" not in plan, plan


class TestEwma:
    def test_single_event_user_equals_value(self, spark):
        from concurrent_etl_spark.queries_temporal import q_ewma_user_value

        rows = q_ewma_user_value(spark, "/root/testdata/sf0.001").collect()
        assert rows
        # first purchase of every user: EWMA == value exactly
        first_seen = {}
        for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
            if r["user_id"] not in first_seen:
                first_seen[r["user_id"]] = r
        for r in first_seen.values():
            assert abs(r["ewma"] - round(r["value"], 9)) < 1e-9

    def test_ewma_between_min_and_max_of_window(self, spark):
        from concurrent_etl_spark.queries_temporal import q_ewma_user_value

        rows = q_ewma_user_value(spark, "/root/testdata/sf0.001").collect()
        by_user = {}
        for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
            hist = by_user.setdefault(r["user_id"], [])
            hist.append(r["value"])
            window = hist[-10:]
            assert min(window) - 1e-9 <= r["ewma"] <= max(window) + 1e-9


class TestIntervalAnalytics:
    """Brute-force verification of the sweep-line and island ops."""

    def _intervals(self, spark):
        from concurrent_etl_spark.engine import load_table
        from pyspark.sql import functions as F

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        rows = ev.select(
            "event_id", "user_id", "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.unix_micros("ts").alias("s"),
        ).collect()
        return [
            (
                r["event_id"], r["user_id"], r["event_type"], r["day"],
                r["s"], r["s"] + (1 + r["event_id"] % 600) * 1_000_000,
            )
            for r in rows
        ]

    def test_max_concurrency_matches_brute_force(self, spark):
        from concurrent_etl_spark.queries_temporal import (
            q_max_concurrency_sweep,
        )

        ivs = self._intervals(spark)
        got = {
            (r["event_type"], r["day"]): (r["max_concurrent"], r["n_intervals"])
            for r in q_max_concurrency_sweep(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        cohorts = {}
        for _, _, typ, day, s, e in ivs:
            cohorts.setdefault((typ, day), []).append((s, e))
        for key, members in cohorts.items():
            # sweep: -1 strictly before +1 at equal t ([s, e) exact)
            pts = sorted(
                [(s, 1) for s, _ in members] + [(e, -1) for _, e in members]
            )
            best = cur = 0
            for _, d in pts:
                cur += d
                best = max(best, cur)
            assert got[key] == (best, len(members))

    def test_islands_match_brute_force_union(self, spark):
        from concurrent_etl_spark.queries_temporal import (
            q_interval_islands_merge,
        )

        ivs = self._intervals(spark)
        got = {
            r["user_id"]: (r["n_islands"], r["covered_us"], r["longest_us"])
            for r in q_interval_islands_merge(
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        by_user = {}
        for _, uid, _, _, s, e in ivs:
            by_user.setdefault(uid, []).append((s, e))
        for uid, members in by_user.items():
            merged = []
            for s, e in sorted(members):
                if merged and s <= merged[-1][1]:  # touching merges
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            lens = [e - s for s, e in merged]
            assert got[uid] == (len(merged), sum(lens), max(lens))


class TestCogroupAsofMerge:
    def test_matches_relational_asof_operator(self, spark):
        """The cogrouped pandas merge must agree row-for-row with the
        union-scan asof_join operator on the same inputs."""
        from pyspark.sql import functions as F

        from concurrent_etl_spark.queries_temporal import (
            q_asof_join,
            q_cogroup_asof_merge,
        )

        sf = "/root/testdata/sf0.001"
        pandas_side = {
            (r["user_id"], r["event_id"]): (
                r["prior_event_id"],
                r["prior_ts"],
            )
            for r in q_cogroup_asof_merge(spark, sf).collect()
        }
        relational = {
            (r["user_id"], r["event_id"]): (
                r["prior_event_id"],
                r["prior_ts"],
            )
            for r in q_asof_join(spark, sf).collect()
        }
        assert pandas_side == relational


def test_scd2_pit_zero_width_version_is_skipped(spark):
    """Two dimension versions created at the SAME instant: the
    superseded one has a zero-width [t, t) interval and must never
    match; facts at exactly t pick the survivor (greater event_id),
    matching the oracle's interval semantics."""
    from pyspark.sql import Window

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    t1 = dt.datetime(2024, 1, 2, 12, 0, 0)
    signups = spark.createDataFrame(
        [(1, t0, 10, 100.0), (1, t0, 11, 200.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = signups.select(
        "user_id",
        "ts",
        "event_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("value").alias("state_value"),
    )
    facts = spark.createDataFrame(
        [(1, 50, t0), (1, 51, t1)],
        "user_id long, event_id long, ts timestamp",
    )
    out = {
        r["event_id"]: (r["v_version"], r["v_state_value"])
        for r in asof_join(
            facts,
            dim,
            on="user_id",
            ts_col="ts",
            right_id="event_id",
            right_vals=["version", "state_value"],
            prefix="v_",
        ).collect()
    }
    # both facts see version 2 (the survivor); version 1's zero-width
    # interval is unreachable
    assert out[50] == (2, 200.0)
    assert out[51] == (2, 200.0)
