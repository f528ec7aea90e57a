"""Multi-writer transactional commits (sources/txn.py): the CAS
commit log, optimistic merge retry, lost-update prevention under
real thread concurrency, crash-orphan invisibility, and GC."""

from __future__ import annotations

import os
import threading

import pytest

from concurrent_etl_spark.sources.txn import (
    CommitConflict,
    txn_commit,
    txn_latest,
    txn_merge,
    txn_read,
    txn_vacuum,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


class TestCommitLog:
    def test_blind_commits_are_sequential_versions(self, spark, tmp_path):
        p = str(tmp_path / "t")
        assert txn_latest(p) == 0
        assert txn_commit(_df(spark, [(1, "a")]), p) == 1
        assert txn_commit(_df(spark, [(1, "b")]), p) == 2
        assert txn_latest(p) == 2
        assert [r["v"] for r in txn_read(spark, p).collect()] == ["b"]
        # time travel to v1 still sees the old content
        assert [r["v"] for r in txn_read(spark, p, 1).collect()] == ["a"]

    def test_read_empty_table_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            txn_read(spark, str(tmp_path / "none"))

    def test_crashed_writer_is_invisible(self, spark, tmp_path):
        """Data directory without a commit record (crash between the
        write and the CAS) must not be readable as a version."""
        p = str(tmp_path / "t")
        txn_commit(_df(spark, [(1, "a")]), p)
        # simulate the crash: a fully-written but never-claimed dir
        _df(spark, [(9, "ghost")]).write.parquet(os.path.join(p, "d-crashed"))
        assert txn_latest(p) == 1
        assert {r["k"] for r in txn_read(spark, p).collect()} == {1}


class TestOptimisticMerge:
    def test_merge_upserts_against_latest(self, spark, tmp_path):
        p = str(tmp_path / "t")
        txn_merge(spark, p, _df(spark, [(1, "a"), (2, "b")]), ["k"])
        txn_merge(spark, p, _df(spark, [(2, "B"), (3, "c")]), ["k"])
        rows = {r["k"]: r["v"] for r in txn_read(spark, p).collect()}
        assert rows == {1: "a", 2: "B", 3: "c"}
        assert txn_latest(p) == 2

    def test_concurrent_merges_lose_no_update(self, spark, tmp_path):
        """The protocol's reason to exist: N threads merging disjoint
        keys against the same table race their CAS claims; every
        batch must land (a stale merge that claimed a later version
        would silently drop a concurrent writer's rows)."""
        p = str(tmp_path / "t")
        n_threads, per_thread = 4, 3
        errors = []

        def writer(tid: int) -> None:
            try:
                for i in range(per_thread):
                    k = tid * 100 + i
                    txn_merge(
                        spark, p, _df(spark, [(k, f"w{tid}b{i}")]), ["k"],
                        max_retries=60,
                    )
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [
            threading.Thread(target=writer, args=(t,))
            for t in range(n_threads)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        rows = {r["k"]: r["v"] for r in txn_read(spark, p).collect()}
        expected = {
            t * 100 + i: f"w{t}b{i}"
            for t in range(n_threads)
            for i in range(per_thread)
        }
        assert rows == expected
        # one committed version per successful merge, no gaps
        assert txn_latest(p) == n_threads * per_thread

    def test_conflict_exhaustion_raises(self, spark, tmp_path, monkeypatch):
        p = str(tmp_path / "t")
        txn_commit(_df(spark, [(1, "a")]), p)
        # force every CAS to lose, as if faster writers always win
        from concurrent_etl_spark.sources import txn as txn_mod

        monkeypatch.setattr(
            txn_mod, "_try_claim", lambda *a, **k: False
        )
        with pytest.raises(CommitConflict):
            txn_merge(
                spark, p, _df(spark, [(2, "b")]), ["k"], max_retries=3
            )


class TestVacuum:
    def test_vacuum_drops_expired_and_orphans_keeps_window(
        self, spark, tmp_path
    ):
        p = str(tmp_path / "t")
        for i in range(5):
            txn_commit(_df(spark, [(i, f"v{i + 1}")]), p)
        _df(spark, [(9, "ghost")]).write.parquet(os.path.join(p, "d-orphan"))
        out = txn_vacuum(p, keep_last=2)
        assert out["versions"] == [1, 2, 3]
        assert out["orphans"] == ["d-orphan"]
        # retained window still reads
        assert {r["v"] for r in txn_read(spark, p).collect()} == {"v5"}
        assert {r["v"] for r in txn_read(spark, p, 4).collect()} == {"v4"}
        # expired version's data is gone
        with pytest.raises(Exception):  # noqa: B017 - any read failure
            txn_read(spark, p, 1).collect()
