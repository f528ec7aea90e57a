"""Structured Streaming tests: file-source ETL, checkpoint exactly-once,
foreachBatch merge (SURVEY §2.8 T1-T5)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from concurrent_etl_spark.streaming.file_stream import (
    file_stream_etl,
    foreach_batch_upsert,
    merge_into_parquet,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("qty", StringType()),  # all-string staging
        StructField("price", DoubleType()),
    ]
)


def _write_csv(path, rows, header="id,qty,price"):
    path.write_text(header + "\n" + "\n".join(rows) + "\n")


class TestFileStream:
    def test_discover_transform_sink_exactly_once(self, spark, tmp_path):
        src = tmp_path / "sample"
        src.mkdir()
        sink = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        _write_csv(src / "f1_OPERATIONS.csv", ["1,10,1.5", "2,20,2.5"])
        _write_csv(src / "f2_OPERATIONS.csv", ["3,30,3.5"])

        def transform(df):
            return df.select(
                "id",
                F.col("qty").try_cast("long").alias("qty"),
                "price",
                "_source_file",
            )

        q = file_stream_etl(
            spark, str(src), SCHEMA, transform, sink, ckpt, available_now=True
        )
        q.awaitTermination(60)
        out = spark.read.parquet(sink)
        assert out.count() == 3
        assert dict(out.dtypes)["qty"] == "bigint"

        # second run with one NEW file: checkpoint must skip f1/f2 (T2)
        _write_csv(src / "f3_OPERATIONS.csv", ["4,40,4.5"])
        q2 = file_stream_etl(
            spark, str(src), SCHEMA, transform, sink, ckpt, available_now=True
        )
        q2.awaitTermination(60)
        out2 = spark.read.parquet(sink)
        assert out2.count() == 4  # not 7 — old files not reprocessed
        files = [r[0] for r in out2.select("_source_file").distinct().collect()]
        assert len(files) == 3


class TestMergeIntoParquet:
    def test_upsert_semantics(self, spark, tmp_path):
        target = str(tmp_path / "fact")
        first = spark.createDataFrame(
            [(1, "a"), (2, "b")], ["id", "v"]
        )
        merge_into_parquet(spark, target, first, ["id"])
        update = spark.createDataFrame(
            [(2, "B"), (3, "c")], ["id", "v"]
        )
        merge_into_parquet(spark, target, update, ["id"])
        rows = {r["id"]: r["v"] for r in spark.read.parquet(target).collect()}
        assert rows == {1: "a", 2: "B", 3: "c"}

    def test_idempotent_replay(self, spark, tmp_path):
        """Re-running the same batch (checkpoint replay) must not dup."""
        target = str(tmp_path / "fact")
        batch = spark.createDataFrame([(1, "a")], ["id", "v"])
        merge_into_parquet(spark, target, batch, ["id"])
        merge_into_parquet(spark, target, batch, ["id"])
        assert spark.read.parquet(target).count() == 1


class TestForeachBatchPipeline:
    def test_stream_to_merged_fact(self, spark, tmp_path):
        """End-to-end T4: file stream -> foreachBatch -> merged fact table."""
        src = tmp_path / "sample"
        src.mkdir()
        target = str(tmp_path / "fact")
        ckpt = str(tmp_path / "ckpt")
        _write_csv(src / "b1.csv", ["1,10,1.5", "1,10,1.5", "2,20,2.5"])

        handler = foreach_batch_upsert(
            spark,
            target,
            keys=["id"],
            transform=lambda df: df.select(
                "id", F.col("qty").try_cast("long").alias("qty"), "price"
            ),
        )
        q = (
            spark.readStream.format("csv")
            .schema(SCHEMA)
            .option("header", "true")
            .load(str(src))
            .writeStream.foreachBatch(handler)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        rows = {r["id"]: r["qty"] for r in spark.read.parquet(target).collect()}
        assert rows == {1: 10, 2: 20}  # in-batch dup collapsed by merge keys


    def test_stream_merge_commits_snapshots_with_history(self, spark, tmp_path):
        """T4 through the unified transactional layer: each
        micro-batch commits a snapshot version via merge_into_snapshot,
        so the stream's own history is readable back through
        read_snapshot and auditable with snapshot_diff."""
        from concurrent_etl_spark.sources.warehouse import (
            latest_version,
            read_snapshot,
            snapshot_diff,
        )

        src = tmp_path / "sample"
        src.mkdir()
        target = str(tmp_path / "fact_versioned")
        ckpt = str(tmp_path / "ckpt")
        _write_csv(src / "b1.csv", ["1,10,1.5", "2,20,2.5"])

        def run():
            handler = foreach_batch_upsert(
                spark,
                target,
                keys=["id"],
                transform=lambda df: df.select(
                    "id", F.col("qty").try_cast("long").alias("qty"), "price"
                ),
                versioned=True,
            )
            q = (
                spark.readStream.format("csv")
                .schema(SCHEMA)
                .option("header", "true")
                .load(str(src))
                .writeStream.foreachBatch(handler)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)

        run()
        assert latest_version(target) == 1
        # second batch: update key 2, insert key 3
        _write_csv(src / "b2.csv", ["2,99,2.5", "3,30,3.5"])
        run()
        assert latest_version(target) == 2
        # latest reflects the merge...
        rows = {
            r["id"]: r["qty"] for r in read_snapshot(spark, target).collect()
        }
        assert rows == {1: 10, 2: 99, 3: 30}
        # ...and v1 is still intact via time travel
        old = {
            r["id"]: r["qty"]
            for r in read_snapshot(spark, target, 1).collect()
        }
        assert old == {1: 10, 2: 20}
        # the commit-level audit sees exactly what batch 2 changed
        diff = {
            (r["op"], r["id"])
            for r in snapshot_diff(spark, target, 1, 2, ["id"]).collect()
        }
        assert diff == {("added", 3), ("changed", 2)}


class TestStatefulRunningTotals:
    def test_state_survives_across_batches_and_restart(self, spark, tmp_path):
        """applyInPandasWithState: totals accumulate across micro-batches
        via the checkpointed state store, including after query restart."""
        from pyspark.sql.types import TimestampType

        from concurrent_etl_spark.streaming.stateful import user_running_totals

        schema = StructType(
            [
                StructField("user_id", LongType()),
                StructField("ts", TimestampType()),
                StructField("value", DoubleType()),
            ]
        )
        src = tmp_path / "events"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        sink = str(tmp_path / "totals")

        def run_once():
            # memory sink can't recover from a checkpoint; foreachBatch ->
            # parquet append is the restartable update-mode sink
            q = (
                user_running_totals(
                    spark.readStream.format("csv")
                    .schema(schema)
                    .option("header", "true")
                    .load(str(src))
                )
                .writeStream.foreachBatch(
                    lambda batch, _id: batch.write.mode("append").parquet(sink)
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            latest = spark.sql(
                "SELECT * FROM (SELECT *, row_number() OVER "
                "(PARTITION BY user_id ORDER BY n_events DESC) AS rn "
                f"FROM parquet.`{sink}`) WHERE rn = 1"
            )
            return {
                r.user_id: (r.n_events, r.total_value) for r in latest.collect()
            }

        _write_csv(
            src / "b1.csv",
            ["1,2024-01-01T10:00:00,1.5", "1,2024-01-01T11:00:00,2.0",
             "2,2024-01-01T10:30:00,4.0"],
            header="user_id,ts,value",
        )
        first = run_once()
        assert first == {1: (2, 3.5), 2: (1, 4.0)}

        # new file after a 'restart': state must carry, not recount
        _write_csv(
            src / "b2.csv",
            ["1,2024-01-02T09:00:00,10.0", "3,2024-01-02T09:30:00,7.0"],
            header="user_id,ts,value",
        )
        second = run_once()
        assert second[1] == (3, 13.5)  # 2 prior events + 1 new
        assert second[3] == (1, 7.0)


class TestStreamStreamJoin:
    def test_attribution_join_matches_batch(self, spark, tmp_path):
        """Watermarked stream-stream interval join == its batch analog."""
        import datetime as dt

        from concurrent_etl_spark.streaming.windows import (
            stream_stream_attribution_join,
        )

        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

        def ts(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        views = [(1, 100, ts(0)), (1, 101, ts(90)), (2, 102, ts(0))]
        # u1 clicks at +30 (matches view 100 only: 90 < 30 is false for
        # view 101), u2 clicks at +70 (outside 1h window of view 102)
        clicks = [(1, 900, ts(30)), (2, 901, ts(70))]
        vdf = spark.createDataFrame(views, ["user_id", "view_id", "view_ts"])
        cdf = spark.createDataFrame(clicks, ["user_id", "click_id", "click_ts"])
        vpath, cpath = str(tmp_path / "views"), str(tmp_path / "clicks")
        vdf.write.parquet(vpath)
        cdf.write.parquet(cpath)

        sv = spark.readStream.schema(vdf.schema).parquet(vpath)
        sc = spark.readStream.schema(cdf.schema).parquet(cpath)
        out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        q = (
            stream_stream_attribution_join(sv, sc)
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            (r.user_id, r.view_id, r.click_id)
            for r in spark.read.parquet(out_path).collect()
        }
        batch = {
            (r.user_id, r.view_id, r.click_id)
            for r in stream_stream_attribution_join(vdf, cdf).collect()
        }
        assert got == batch == {(1, 100, 900)}


class TestDedupWithinWatermark:
    def test_cross_file_duplicates_dropped(self, spark, tmp_path):
        import datetime as dt

        from concurrent_etl_spark.streaming.windows import dedup_within_watermark

        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        schema = "event_id long, ts timestamp"
        src = tmp_path / "src"
        src.mkdir()
        spark.createDataFrame(
            [(1, t0), (2, t0 + dt.timedelta(minutes=1))], schema
        ).write.parquet(str(src / "a"))
        # duplicate event_id=1 arrives in a different file, 5 min later
        spark.createDataFrame(
            [(1, t0 + dt.timedelta(minutes=5)), (3, t0 + dt.timedelta(minutes=6))],
            schema,
        ).write.parquet(str(src / "b"))

        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        q = (
            dedup_within_watermark(stream, ["event_id"], "ts", "2 hours")
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        ids = sorted(
            r.event_id for r in spark.read.parquet(out_path).collect()
        )
        assert ids == [1, 2, 3]


class TestStreamStaticJoin:
    def test_enrich_matches_batch(self, spark, tmp_path):
        import datetime as dt

        from concurrent_etl_spark.streaming.file_stream import stream_static_enrich

        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
        fact_schema = "id long, dim_key long, ts timestamp"
        src = tmp_path / "facts"
        src.mkdir()
        spark.createDataFrame(
            [(1, 10, t0), (2, 20, t0), (3, 99, t0)], fact_schema
        ).write.parquet(str(src / "a"))
        dim = spark.createDataFrame(
            [(10, "x"), (20, "y")], "dim_key long, name string"
        )

        stream = spark.readStream.schema(fact_schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        q = (
            stream_static_enrich(stream, dim, ["dim_key"])
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            (r["id"], r["name"])
            for r in spark.read.parquet(out_path).collect()
        }
        # left join: unmatched key 99 survives with NULL name
        assert got == {(1, "x"), (2, "y"), (3, None)}


class TestLateDataDrop:
    def test_event_older_than_watermark_is_dropped(self, spark, tmp_path):
        import datetime as dt

        from concurrent_etl_spark.streaming.windows import tumbling_window_agg

        t = lambda m: dt.datetime(2026, 1, 1, 12, 0, 0) + dt.timedelta(minutes=m)  # noqa: E731
        schema = "event_id long, ts timestamp, value double, event_type string"
        src = tmp_path / "src"
        src.mkdir()
        out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run_once():
            stream = spark.readStream.schema(schema).option(
                "recursiveFileLookup", "true"
            ).parquet(str(src))
            agg = tumbling_window_agg(
                stream, window_size="10 minutes", watermark="10 minutes",
                ts_col="ts",
            )
            q = (
                agg.writeStream.outputMode("append")
                .format("parquet")
                .option("path", out_path)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        # batch 1: two events in [12:00,12:10) + one at 13:00 that
        # advances the watermark to 12:50, finalizing the first window
        spark.createDataFrame(
            [(1, t(0), 1.0, "view"), (2, t(5), 1.0, "view"),
             (3, t(60), 1.0, "view")], schema
        ).write.parquet(str(src / "a"))
        run_once()

        # batch 2 (restart from checkpoint, watermark persisted):
        # event_id=4 is at 12:01 — 49 min older than the watermark —
        # and must be DROPPED; event at 14:00 closes the 13:00 window
        spark.createDataFrame(
            [(4, t(1), 100.0, "view"), (5, t(120), 1.0, "view")], schema
        ).write.parquet(str(src / "b"))
        run_once()

        rows = spark.read.parquet(out_path).collect()
        by_start = {r["window_start"]: r for r in rows}
        w1 = by_start[t(0)]
        assert w1["n_events"] == 2  # late event 4 NOT counted
        assert t(60) in by_start and by_start[t(60)]["n_events"] == 1


class TestMergeAdditive:
    def test_partials_accumulate_across_batches(self, spark, tmp_path):
        from concurrent_etl_spark.streaming.file_stream import merge_additive

        target = str(tmp_path / "rollup")
        b1 = spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 5.0), ("b", 1, 1.0)],
            ["k", "n", "v"],
        )
        merge_additive(spark, target, b1, ["k"], ["n", "v"])
        b2 = spark.createDataFrame(
            [("a", 4, 2.5), ("c", 7, 7.0)], ["k", "n", "v"]
        )
        merge_additive(spark, target, b2, ["k"], ["n", "v"])

        got = {
            r["k"]: (r["n"], r["v"])
            for r in spark.read.parquet(target).collect()
        }
        assert got == {"a": (7, 17.5), "b": (1, 1.0), "c": (7, 7.0)}


class TestPartitionScopedMerge:
    def test_only_touched_partitions_rewritten(self, spark, tmp_path):
        """Upserting a delta that touches one day must leave the
        other days' parquet files byte-identical on disk (same
        inode-level files, not rewritten equivalents) — the property
        that turns a 1 GB delta into a 1 GB write at 100 TB."""
        import glob
        import os

        from concurrent_etl_spark.streaming.file_stream import (
            merge_into_partitioned_parquet,
        )

        target = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, "d1", 10.0), (2, "d1", 20.0), (3, "d2", 30.0), (4, "d3", 40.0)],
            "k int, day string, v double",
        )
        merge_into_partitioned_parquet(spark, target, base, ["k"], "day")
        untouched_before = {
            f: os.stat(f).st_mtime_ns
            for f in glob.glob(f"{target}/day=d2/*.parquet")
            + glob.glob(f"{target}/day=d3/*.parquet")
        }
        assert untouched_before
        delta = spark.createDataFrame(
            [(2, "d1", 99.0), (5, "d1", 50.0)], "k int, day string, v double"
        )
        touched = merge_into_partitioned_parquet(
            spark, target, delta, ["k"], "day"
        )
        assert touched == ["d1"]
        untouched_after = {
            f: os.stat(f).st_mtime_ns
            for f in glob.glob(f"{target}/day=d2/*.parquet")
            + glob.glob(f"{target}/day=d3/*.parquet")
        }
        assert untouched_after == untouched_before  # files never rewritten
        got = {
            (r["k"], r["day"], r["v"])
            for r in spark.read.parquet(target).collect()
        }
        assert got == {
            (1, "d1", 10.0), (2, "d1", 99.0), (5, "d1", 50.0),
            (3, "d2", 30.0), (4, "d3", 40.0),
        }

    def test_idempotent_replay(self, spark, tmp_path):
        from concurrent_etl_spark.streaming.file_stream import (
            merge_into_partitioned_parquet,
        )

        target = str(tmp_path / "tbl")
        base = spark.createDataFrame(
            [(1, "d1", 1.0), (2, "d2", 2.0)], "k int, day string, v double"
        )
        merge_into_partitioned_parquet(spark, target, base, ["k"], "day")
        delta = spark.createDataFrame(
            [(1, "d1", 7.0)], "k int, day string, v double"
        )
        for _ in range(2):  # replaying the same batch changes nothing
            merge_into_partitioned_parquet(spark, target, delta, ["k"], "day")
        got = {
            (r["k"], r["day"], r["v"])
            for r in spark.read.parquet(target).collect()
        }
        assert got == {(1, "d1", 7.0), (2, "d2", 2.0)}


class TestEventTimeSessionTimeout:
    def test_sessions_close_when_watermark_passes_gap(self, spark, tmp_path):
        """EventTimeTimeout sessionization: a user's session closes
        (and is emitted exactly once, append-mode) only after later
        events advance the WATERMARK past last-activity + gap — the
        deterministic, replay-stable close no wall clock can give."""
        from pyspark.sql.types import TimestampType

        from concurrent_etl_spark.streaming.stateful import (
            user_sessions_event_timeout,
        )

        schema = StructType(
            [
                StructField("user_id", LongType()),
                StructField("ts", TimestampType()),
            ]
        )
        src = tmp_path / "events"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        sink = str(tmp_path / "sessions")

        def run_once():
            q = (
                user_sessions_event_timeout(
                    spark.readStream.format("csv")
                    .schema(schema)
                    .option("header", "true")
                    .load(str(src)),
                    gap_minutes=30,
                    watermark="0 seconds",
                )
                .writeStream.foreachBatch(
                    lambda batch, _id: batch.write.mode("append").parquet(sink)
                )
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            import glob

            if not glob.glob(f"{sink}/*.parquet"):
                return {}
            return {
                r.user_id: (
                    str(r.session_start), str(r.session_end), r.n_events
                )
                for r in spark.read.parquet(sink).collect()
            }

        # wave 1: user 1 active 10:00-10:05 — session stays OPEN
        # (watermark is at 10:05, gap end is 10:35)
        _write_csv(
            src / "b1.csv",
            ["1,2024-01-01T10:00:00", "1,2024-01-01T10:05:00"],
            header="user_id,ts",
        )
        assert run_once() == {}
        # wave 2: user 2 at 12:00 pushes the watermark past 10:35 —
        # user 1's session closes and emits; user 2's stays open
        _write_csv(
            src / "b2.csv", ["2,2024-01-01T12:00:00"], header="user_id,ts"
        )
        got = run_once()
        assert got == {
            1: ("2024-01-01 10:00:00", "2024-01-01 10:05:00", 2)
        }
        # wave 3: user 3 at 14:00 closes user 2's session the same way
        _write_csv(
            src / "b3.csv", ["3,2024-01-01T14:00:00"], header="user_id,ts"
        )
        got = run_once()
        assert got[2] == ("2024-01-01 12:00:00", "2024-01-01 12:00:00", 1)


class TestStreamingDedupTTLState:
    def _drive(self, spark, src, sink, ckpt, op):
        stream = (
            spark.readStream.format("csv")
            .schema("event_id long, user_id long, value double")
            .option("header", "true")
            .load(str(src))
        )
        q = (
            op(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def test_dedup_drops_cross_batch_replays(self, spark, tmp_path):
        """Streaming dedup with checkpointed per-key flag state:
        first occurrence of each event_id passes; in-batch AND
        cross-batch replays are dropped (applyInPandasWithState
        path — no extra worker deps)."""
        from concurrent_etl_spark.streaming.stateful import (
            dedupe_events_state,
        )

        src = tmp_path / "events"
        src.mkdir()
        sink = str(tmp_path / "deduped")
        ckpt = str(tmp_path / "ckpt")
        (src / "b1.csv").write_text(
            "event_id,user_id,value\n1,10,1.5\n2,20,2.5\n1,10,1.5\n"
        )
        op = lambda st: dedupe_events_state(st, ttl_minutes=None)  # noqa: E731
        self._drive(spark, src, sink, ckpt, op)
        first = spark.read.parquet(sink)
        assert sorted(r["event_id"] for r in first.collect()) == [1, 2]
        # batch 2 replays id 2 (cross-batch dup) and adds id 3
        (src / "b2.csv").write_text(
            "event_id,user_id,value\n2,20,2.5\n3,30,3.5\n"
        )
        self._drive(spark, src, sink, ckpt, op)
        out = spark.read.parquet(sink)
        assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3]

    def test_ttl_variant_dedups_within_window(self, spark, tmp_path):
        """With a (long) TTL the flag state carries a timeout but the
        dedup semantics within the window are identical."""
        from concurrent_etl_spark.streaming.stateful import (
            dedupe_events_state,
        )

        src = tmp_path / "events"
        src.mkdir()
        sink = str(tmp_path / "deduped")
        ckpt = str(tmp_path / "ckpt")
        (src / "b1.csv").write_text(
            "event_id,user_id,value\n7,70,7.5\n7,70,7.5\n8,80,8.5\n"
        )
        op = lambda st: dedupe_events_state(st, ttl_minutes=60)  # noqa: E731
        self._drive(spark, src, sink, ckpt, op)
        (src / "b2.csv").write_text(
            "event_id,user_id,value\n8,80,8.5\n9,90,9.5\n"
        )
        self._drive(spark, src, sink, ckpt, op)
        out = spark.read.parquet(sink)
        assert sorted(r["event_id"] for r in out.collect()) == [7, 8, 9]

    def test_new_api_path_guarded_by_protobuf(self):
        """The transformWithStateInPandas form requires protobuf in
        the workers; in this container the guard must report False
        (the operator upgrades in place where the dep exists)."""
        from concurrent_etl_spark.streaming.stateful import _twsp_available

        assert _twsp_available() is False


class TestStreamStreamLeftOuterJoin:
    def test_unmatched_view_emits_null_after_watermark(self, spark, tmp_path):
        """Outer stream-stream join: the unmatched view's NULL row may
        only emit once the click watermark proves no match can still
        arrive — driven here by a later click batch that advances the
        watermark past view_ts + window."""
        import datetime as dt

        from concurrent_etl_spark.streaming.windows import (
            stream_stream_attribution_left_outer,
        )

        t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

        def ts(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        # u1's view gets a click inside the window; u2's view never
        # does. The GLOBAL watermark is min(view side, click side),
        # so BOTH sides carry a far-future event (+600) — otherwise
        # the unadvanced side pins the watermark and no null can
        # ever emit. View 103 (+600) itself stays unmatched but its
        # own eviction point (+660) is beyond the final watermark.
        views = [(1, 100, ts(0)), (2, 102, ts(0)), (3, 103, ts(600))]
        clicks = [(1, 900, ts(30)), (4, 999, ts(600))]
        vdf = spark.createDataFrame(views, ["user_id", "view_id", "view_ts"])
        cdf = spark.createDataFrame(clicks, ["user_id", "click_id", "click_ts"])
        vpath, cpath = str(tmp_path / "views"), str(tmp_path / "clicks")
        vdf.write.parquet(vpath)
        cdf.write.parquet(cpath)

        out_path, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run():
            sv = spark.readStream.schema(vdf.schema).parquet(vpath)
            sc = spark.readStream.schema(cdf.schema).parquet(cpath)
            q = (
                stream_stream_attribution_left_outer(sv, sc)
                .writeStream.format("parquet")
                .option("path", out_path)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        # null emission happens in a LATER micro-batch than the one
        # that advanced the watermark: feed one more click batch and
        # resume from the checkpoint so the state-eviction pass runs
        spark.createDataFrame(
            [(4, 998, ts(700))], ["user_id", "click_id", "click_ts"]
        ).write.mode("append").parquet(cpath)
        run()

        got = {
            (r.user_id, r.view_id, r.click_id)
            for r in spark.read.parquet(out_path).collect()
        }
        batch = {
            (r.user_id, r.view_id, r.click_id)
            for r in stream_stream_attribution_left_outer(vdf, cdf).collect()
        }
        # batch form: every unmatched view nulls immediately
        assert batch == {(1, 100, 900), (2, 102, None), (3, 103, None)}
        # stream form: 102's null emitted once the watermark passed
        # its eviction point; 103's is correctly HELD (watermark has
        # not yet proven no click can arrive for it) — the difference
        # between outer-join completeness and streaming's only-when-
        # provable emission
        assert got == {(1, 100, 900), (2, 102, None)}


class TestWatermarkWindowRoundtrip:
    def test_trailing_windows_held_back_by_watermark(self, spark):
        """Append mode must NOT emit windows the watermark hasn't
        passed: the sink's max window must end at or before
        max(event_ts) - 30min, and at least one trailing window of
        source data must be absent from the sink."""
        from pyspark.sql import functions as F

        from concurrent_etl_spark.engine import load_table
        from concurrent_etl_spark.queries_streaming import (
            q_stream_window_watermark_roundtrip,
        )

        sf = "/root/testdata/sf0.001"
        out = q_stream_window_watermark_roundtrip(spark, sf)
        ev = load_table(spark, sf, "events").where(
            F.col("event_id") % 13 == 0
        )
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        import datetime as dt

        wm = max_ts - dt.timedelta(minutes=30)
        emitted = out.collect()
        assert emitted
        for r in emitted:
            assert r["window_start"] + dt.timedelta(hours=1) <= wm
        # the source has events after the last emitted window
        last_emitted_end = max(
            r["window_start"] for r in emitted
        ) + dt.timedelta(hours=1)
        n_after = ev.where(F.col("ts") >= F.lit(last_emitted_end)).count()
        assert n_after > 0, "fixture must exercise the held-back tail"

    def test_rerun_reuses_committed_sink(self, spark):
        from concurrent_etl_spark.queries_streaming import (
            q_stream_window_watermark_roundtrip,
        )

        sf = "/root/testdata/sf0.001"
        a = q_stream_window_watermark_roundtrip(spark, sf).count()
        b = q_stream_window_watermark_roundtrip(spark, sf).count()
        assert a == b, "checkpoint guard must make re-invocation a no-op"
