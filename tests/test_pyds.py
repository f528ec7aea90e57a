"""Custom Python DataSource (sources/pyds.py): batch reads with
filter pushdown and time travel, plus the change-feed stream."""

from __future__ import annotations

import pytest

from concurrent_etl_spark.sources import pyds
from concurrent_etl_spark.sources.txn import txn_commit, txn_merge


def _table(spark, tmp_path):
    p = str(tmp_path / "t")
    txn_commit(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
            "k long, name string, score double",
        ),
        p,
    )
    return p


class TestBatchReader:
    def test_roundtrip_matches_direct_read(self, spark, tmp_path):
        p = _table(spark, tmp_path)
        pyds.register(spark)
        out = spark.read.format("ces_txn").option("path", p).load()
        assert {(r["k"], r["name"]) for r in out.collect()} == {
            (1, "a"),
            (2, "b"),
            (3, "c"),
        }
        assert dict(out.dtypes) == {
            "k": "bigint",
            "name": "string",
            "score": "double",
        }

    def test_time_travel_option(self, spark, tmp_path):
        p = _table(spark, tmp_path)
        txn_merge(
            spark,
            p,
            spark.createDataFrame([(2, "B", 99.0)], "k long, name string, score double"),
            ["k"],
        )
        pyds.register(spark)
        latest = spark.read.format("ces_txn").option("path", p).load()
        v1 = (
            spark.read.format("ces_txn")
            .option("path", p)
            .option("version", "1")
            .load()
        )
        assert {r["name"] for r in latest.collect()} == {"a", "B", "c"}
        assert {r["name"] for r in v1.collect()} == {"a", "b", "c"}

    def test_filters_push_down_and_results_stay_correct(self, spark, tmp_path):
        p = _table(spark, tmp_path)
        pyds.register(spark)
        out = (
            spark.read.format("ces_txn")
            .option("path", p)
            .load()
            .where("k > 1 AND name = 'b'")
        )
        import os

        rows = out.collect()
        assert [(r["k"], r["name"]) for r in rows] == [(2, "b")]
        # the scan report records what the planned scan accepted
        # (planning runs in its own worker; the report file is the
        # cross-process audit trail)
        report = open(os.path.join(p, "_scan_report")).read()
        assert "GreaterThan" in report and "EqualTo" in report, report

    def test_empty_table_raises(self, spark, tmp_path):
        pyds.register(spark)
        with pytest.raises(Exception, match="no committed version"):
            spark.read.format("ces_txn").option(
                "path", str(tmp_path / "none")
            ).load()


class TestChangeFeedStream:
    def test_versions_arrive_as_batches_exactly_once(self, spark, tmp_path):
        """Each commit is an offset: the first availableNow run
        delivers v1, a second run after another commit delivers ONLY
        v2 (checkpointed offset, no replay of v1)."""
        p = _table(spark, tmp_path)
        pyds.register(spark)
        sink = str(tmp_path / "feed")
        ckpt = str(tmp_path / "ckpt")

        def run():
            q = (
                spark.readStream.format("ces_txn")
                .option("path", p)
                .option("changefeed", "true")
                .load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        first = spark.read.parquet(sink)
        assert {r["_commit_version"] for r in first.collect()} == {1}
        assert first.count() == 3
        txn_merge(
            spark,
            p,
            spark.createDataFrame(
                [(4, "d", 40.0)], "k long, name string, score double"
            ),
            ["k"],
        )
        run()
        out = spark.read.parquet(sink)
        # v2 snapshot (4 rows) arrived once; v1 not replayed
        assert out.count() == 3 + 4
        assert {r["_commit_version"] for r in out.collect()} == {1, 2}


class TestTransactionalWriter:
    def test_distributed_write_commits_one_version(self, spark, tmp_path):
        """df.write.format('ces_txn'): tasks stage parquet files into
        an anonymous dir, commit publishes it as the next version via
        the log CAS — readable back through the same source."""
        p = str(tmp_path / "t")
        pyds.register(spark)
        df = spark.createDataFrame(
            [(i, f"n{i}") for i in range(10)], "k long, name string"
        ).repartition(3)
        df.write.format("ces_txn").option("path", p).mode("overwrite").save()
        from concurrent_etl_spark.sources.txn import txn_latest, txn_read

        assert txn_latest(p) == 1
        out = txn_read(spark, p)
        assert out.count() == 10
        # a second write is a second version, first intact
        df.limit(2).write.format("ces_txn").option("path", p).mode(
            "overwrite"
        ).save()
        assert txn_latest(p) == 2
        assert txn_read(spark, p).count() == 2
        assert txn_read(spark, p, 1).count() == 10
        # and the connector's reader sees the same history
        v1 = (
            spark.read.format("ces_txn")
            .option("path", p)
            .option("version", "1")
            .load()
        )
        assert v1.count() == 10

    def test_append_mode_rejected(self, spark, tmp_path):
        p = str(tmp_path / "t")
        pyds.register(spark)
        df = spark.createDataFrame([(1, "a")], "k long, name string")
        df.write.format("ces_txn").option("path", p).mode("overwrite").save()
        with pytest.raises(Exception, match="snapshot|overwrite|merge"):
            df.write.format("ces_txn").option("path", p).mode(
                "append"
            ).save()


class TestStreamWriter:
    def test_each_batch_commits_one_version_exactly_once(
        self, spark, tmp_path
    ):
        """writeStream.format('ces_txn'): one committed version per
        micro-batch; a restarted query (same checkpoint) does not
        duplicate versions for already-committed batches."""
        from concurrent_etl_spark.sources.txn import txn_latest, txn_read

        p = str(tmp_path / "t")
        pyds.register(spark)
        src = tmp_path / "src"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        (src / "b1.csv").write_text("k,name\n1,a\n2,b\n")

        def run():
            q = (
                spark.readStream.format("csv")
                .schema("k long, name string")
                .option("header", "true")
                .load(str(src))
                .writeStream.format("ces_txn")
                .option("path", p)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        assert txn_latest(p) == 1
        assert txn_read(spark, p).count() == 2
        # second wave -> second version; first untouched
        (src / "b2.csv").write_text("k,name\n3,c\n")
        run()
        assert txn_latest(p) == 2
        # append semantics: v2 = full table (v1's files carried
        # forward as hardlinks + the new batch); v1 still time-travels
        assert txn_read(spark, p, 2).count() == 3
        assert {r["name"] for r in txn_read(spark, p).collect()} == {
            "a", "b", "c",
        }
        assert txn_read(spark, p, 1).count() == 2
        # re-run with nothing new: no phantom version
        run()
        assert txn_latest(p) == 2
