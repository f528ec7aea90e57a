"""Unit tests for relational + composite operators (SURVEY §2.2-2.6)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from concurrent_etl_spark.operators.dims import upsert_dimension
from concurrent_etl_spark.operators.relational import (
    anti_join,
    dedup_by_key,
    new_keys,
    semi_join,
)


class TestNewKeys:
    def test_null_keys_dropped_and_distinct(self, spark):
        batch = spark.createDataFrame(
            [("a",), ("a",), (None,), ("b",), ("c",)], ["k"]
        )
        dim = spark.createDataFrame([("b",)], ["k"])
        out = sorted(r["k"] for r in new_keys(batch, dim, "k").collect())
        assert out == ["a", "c"]

    def test_null_in_dim_does_not_swallow_batch(self, spark):
        # SQL NOT IN with a NULL in the subquery returns no rows;
        # the pandas ~isin (and our left_anti) keeps the new keys.
        batch = spark.createDataFrame([("a",)], ["k"])
        dim = spark.createDataFrame([(None,), ("b",)], ["k"])
        assert [r["k"] for r in new_keys(batch, dim, "k").collect()] == ["a"]


class TestJoins:
    def test_anti_semi_partition(self, spark):
        left = spark.createDataFrame([(i,) for i in range(10)], ["k"])
        right = spark.createDataFrame([(i,) for i in range(0, 10, 2)], ["k"])
        a = anti_join(left, right, "k").count()
        s = semi_join(left, right, "k").count()
        assert a == 5 and s == 5
        assert a + s == left.count()


class TestDedup:
    def test_deterministic_min(self, spark):
        df = spark.createDataFrame(
            [("k1", 5, "z"), ("k1", 3, "a"), ("k2", 1, "m")], ["k", "n", "s"]
        )
        rows = {r["k"]: (r["n"], r["s"]) for r in dedup_by_key(df, ["k"]).collect()}
        assert rows == {"k1": (3, "a"), "k2": (1, "m")}

    def test_all_key_columns_falls_back_to_distinct(self, spark):
        df = spark.createDataFrame([(1, 2), (1, 2), (3, 4)], ["a", "b"])
        assert dedup_by_key(df, ["a", "b"]).count() == 2


class TestUpsertDimension:
    def _dim(self, spark, keys):
        if not keys:
            return spark.createDataFrame([], "id bigint, key string")
        w = Window.orderBy("key")
        return (
            spark.createDataFrame([(k,) for k in keys], ["key"])
            .select(F.row_number().over(w).cast("bigint").alias("id"), "key")
        )

    def test_assigns_contiguous_ids_after_max(self, spark):
        dim = self._dim(spark, ["a", "b"])
        batch = spark.createDataFrame(
            [("c",), ("b",), ("d",), (None,), ("c",)], ["key"]
        )
        out = {r["key"]: r["id"] for r in upsert_dimension(dim, batch, "key").collect()}
        assert out == {"a": 1, "b": 2, "c": 3, "d": 4}

    def test_idempotent(self, spark):
        dim = self._dim(spark, ["a"])
        batch = spark.createDataFrame([("b",)], ["key"])
        once = upsert_dimension(dim, batch, "key")
        twice = upsert_dimension(once, batch, "key")
        assert sorted((r["id"], r["key"]) for r in twice.collect()) == [
            (1, "a"),
            (2, "b"),
        ]

    def test_empty_dim(self, spark):
        dim = self._dim(spark, [])
        batch = spark.createDataFrame([("x",), ("y",)], ["key"])
        out = {r["key"]: r["id"] for r in upsert_dimension(dim, batch, "key").collect()}
        assert out == {"x": 1, "y": 2}

    def test_extra_cols_carried(self, spark):
        dim = spark.createDataFrame([], "id bigint, key string, display string")
        batch = spark.createDataFrame(
            [("w1", "Widget One"), ("w1", "Widget Uno"), ("w2", "Widget Two")],
            ["key", "display"],
        )
        out = {
            r["key"]: (r["id"], r["display"])
            for r in upsert_dimension(
                dim, batch, "key", extra_cols=["display"]
            ).collect()
        }
        assert out == {"w1": (1, "Widget One"), "w2": (2, "Widget Two")}


class TestFlagshipPlan:
    def test_no_shuffle_on_fact_side(self, tables):
        """The 4-dim chain resolves to broadcast joins at test SF.

        orders/customer carry NO broadcast hint (they scale with the
        fact and must not be broadcast at 100 TB); the planner's
        size-stat check + AQE pick broadcast here because the test
        tables are tiny. The assertion is therefore that stats-driven
        selection works — not that broadcast is forced.
        """
        from concurrent_etl_spark.operators.etl import flagship_confirmation
        from concurrent_etl_spark.plans.explain import assert_broadcast_joins, plan_string

        df = flagship_confirmation(tables)
        assert_broadcast_joins(df, 4)
        # collect() executes df's own QueryExecution, so the adaptive
        # final plan is visible on re-explain (count() would not be)
        assert len(df.collect()) > 0
        final = plan_string(df, "simple")
        assert "isFinalPlan=true" in final
        assert "SortMergeJoin" not in final


class TestAuditObserve:
    def test_metrics_collected_on_write_pass(self, spark, tables, tmp_path):
        from concurrent_etl_spark.operators.audit import audited, expect_rows

        df, obs = audited(
            tables["orders"], count_col="o_custkey", sum_col="o_totalprice"
        )
        df.write.format("noop").mode("overwrite").save()
        m = obs.get
        n = tables["orders"].count()
        assert m["rows"] == n
        assert m["nonnull_o_custkey"] == n
        assert m["sum_o_totalprice"] > 0
        expect_rows(obs, at_least=1)  # must not raise

    def test_expect_rows_raises_on_empty(self, spark, tables):
        import pytest as _pytest

        from concurrent_etl_spark.operators.audit import audited, expect_rows

        from pyspark.sql import functions as F
        df, obs = audited(tables["orders"].where(F.lit(False)))
        df.write.format("noop").mode("overwrite").save()
        with _pytest.raises(AssertionError, match="audit"):
            expect_rows(obs, at_least=1)


class TestScd2History:
    def test_collapse_and_intervals(self, spark):
        import datetime as dt

        from concurrent_etl_spark.operators.dims import scd2_history

        t0 = dt.datetime(2026, 1, 1)

        def ts(h):
            return t0 + dt.timedelta(hours=h)

        rows = [
            # user 1: a, a (collapse), b, a  -> 3 versions
            (1, "a", ts(0), 10),
            (1, "a", ts(1), 11),
            (1, "b", ts(2), 12),
            (1, "a", ts(3), 13),
            # user 2: single state -> 1 current version
            (2, "x", ts(0), 20),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp, event_id long"
        )
        got = sorted(
            (r.user_id, r.event_type, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_history(
                df, key="user_id", ts_col="ts", attr="event_type", tiebreak="event_id"
            ).collect()
        )
        assert got == [
            (1, "a", ts(0), ts(2), False),
            (1, "a", ts(3), None, True),
            (1, "b", ts(2), ts(3), False),
            (2, "x", ts(0), None, True),
        ]


class TestRegionalVolumePlan:
    def test_pushdowns_and_no_fact_broadcast(self, spark):
        """Q5-shaped join: filters reach the scans; lineitem is never
        a broadcast build side."""
        from concurrent_etl_spark.queries_relational3 import (
            q_regional_supplier_volume,
        )
        from concurrent_etl_spark.plans.explain import plan_string

        df = q_regional_supplier_volume(spark, "/root/testdata/sf0.001")
        plan = plan_string(df, "formatted")
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert any("o_orderdate" in l and "GreaterThanOrEqual" in l for l in pushed)
        assert any("EqualTo(r_name,ASIA)" in l for l in pushed)
        # the date filter also prunes lineitem reads indirectly via the
        # join, but lineitem's own scan must project only needed columns
        read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
        li_schema = [l for l in read_schemas if "l_orderkey" in l]
        assert li_schema and "l_returnflag" not in li_schema[0]
        # correctness of the join result is oracle-checked; here just
        # confirm it executes and aggregates
        assert df.count() >= 1


class TestZscoreApplyInPandas:
    def test_matches_window_formulation(self, spark, tables):
        """Grouped-map applyInPandas z-scores equal the pure-SQL window
        formulation (tolerance: summation-order float noise only)."""
        from concurrent_etl_spark.operators.relational import zscore_per_group

        ev = tables["events"].select("user_id", "value")
        got = {
            (r.user_id, round(r.value, 6)): r.zscore
            for r in zscore_per_group(ev, "user_id", "value").collect()
        }
        w = Window.partitionBy("user_id")
        exp = {
            (r.user_id, round(r.value, 6)): r.z
            for r in ev.select(
                "user_id",
                "value",
                (
                    (F.col("value") - F.avg("value").over(w))
                    / F.stddev_pop("value").over(w)
                ).alias("z"),
            ).collect()
        }
        assert set(got) == set(exp)
        assert all(abs(got[k] - exp[k]) < 1e-9 for k in got)
