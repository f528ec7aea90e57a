"""Layout-optimization tests: bucketed co-located joins (no shuffle)
and partition pruning (no non-matching files scanned)."""

from __future__ import annotations

from pyspark.sql import functions as F

from concurrent_etl_spark.plans.explain import plan_string
from concurrent_etl_spark.sources.warehouse import (
    write_bucketed,
    write_partitioned,
)


class TestBucketedJoin:
    def test_colocated_join_has_no_exchange(self, spark, tables, tmp_path):
        """Both sides bucketed+sorted on the join key => sort-merge join
        with zero Exchange operators (the 100 TB co-location story)."""
        write_bucketed(
            tables["lineitem"].select("l_orderkey", "l_extendedprice"),
            "li_bkt",
            str(tmp_path / "li"),
            keys=["l_orderkey"],
            n_buckets=4,
            sort_cols=["l_orderkey"],
        )
        write_bucketed(
            tables["orders"].select("o_orderkey", "o_orderpriority"),
            "ord_bkt",
            str(tmp_path / "ord"),
            keys=["o_orderkey"],
            n_buckets=4,
            sort_cols=["o_orderkey"],
        )
        li = spark.table("li_bkt")
        o = spark.table("ord_bkt")
        # force the non-broadcast path so the assertion is about buckets
        joined = li.hint("merge").join(
            o, li["l_orderkey"] == o["o_orderkey"]
        )
        plan = plan_string(joined, mode="simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # neither side shuffles

        # and the result matches the plain (shuffled) join
        expected = (
            tables["lineitem"]
            .join(
                tables["orders"],
                tables["lineitem"]["l_orderkey"] == tables["orders"]["o_orderkey"],
            )
            .count()
        )
        assert joined.count() == expected

    def test_bucketed_groupby_has_no_exchange(self, spark, tables, tmp_path):
        """Aggregation on the bucket key reuses the clustering too."""
        write_bucketed(
            tables["lineitem"].select("l_orderkey", "l_quantity"),
            "li_bkt2",
            str(tmp_path / "li2"),
            keys=["l_orderkey"],
            n_buckets=4,
        )
        agg = (
            spark.table("li_bkt2")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = plan_string(agg, mode="simple")
        assert "Exchange" not in plan, plan


class TestPartitionPruning:
    def test_filter_prunes_partitions(self, spark, tables, tmp_path):
        path = str(tmp_path / "orders_by_status")
        write_partitioned(
            tables["orders"], path, partition_cols=["o_orderstatus"]
        )
        df = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
        plan = plan_string(df, mode="formatted")
        # the partition filter reaches the file index, not a post-scan Filter
        assert "PartitionFilters" in plan
        assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
        # correctness: same rows as filtering the unpartitioned table
        expected = (
            tables["orders"].where(F.col("o_orderstatus") == "F").count()
        )
        assert df.count() == expected


class TestCompaction:
    def test_compacts_many_small_files_preserving_rows(self, spark, tmp_path):
        from concurrent_etl_spark.sources.warehouse import compact_small_files

        path = str(tmp_path / "t")
        df = spark.range(10000).withColumnRenamed("id", "k")
        # 40 tiny files
        df.repartition(40).write.parquet(path)
        import glob

        assert len(glob.glob(path + "/*.parquet")) == 40
        before = {r["k"] for r in spark.read.parquet(path).collect()}

        n = compact_small_files(spark, path, target_file_bytes=10**9)
        assert n == 1
        after_files = glob.glob(path + "/*.parquet")
        assert len(after_files) == 1
        after = {r["k"] for r in spark.read.parquet(path).collect()}
        assert after == before
        # no staging/backup dirs left behind
        assert not glob.glob(str(tmp_path / "t._compact*"))


class TestBackfillPartitions:
    def test_only_touched_partition_replaced(self, spark, tmp_path):
        from concurrent_etl_spark.sources.warehouse import (
            backfill_partitions,
            write_partitioned,
        )

        path = str(tmp_path / "fact")
        base = spark.createDataFrame(
            [(1, "day1", 10.0), (2, "day1", 20.0),
             (3, "day2", 30.0), (4, "day3", 40.0)],
            "id LONG, day STRING, v DOUBLE",
        )
        write_partitioned(base, path, ["day"])

        # reprocess day 2 with corrected values (and one new row)
        fix = spark.createDataFrame(
            [(3, "day2", 33.0), (5, "day2", 55.0)],
            "id LONG, day STRING, v DOUBLE",
        )
        backfill_partitions(fix, path, ["day"])

        got = {
            (r["id"], r["day"], r["v"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == {
            (1, "day1", 10.0), (2, "day1", 20.0),
            (3, "day2", 33.0), (5, "day2", 55.0),
            (4, "day3", 40.0),
        }

    def test_idempotent_rerun(self, spark, tmp_path):
        from concurrent_etl_spark.sources.warehouse import (
            backfill_partitions,
            write_partitioned,
        )

        path = str(tmp_path / "fact")
        base = spark.createDataFrame(
            [(1, "d1", 1.0), (2, "d2", 2.0)], "id LONG, day STRING, v DOUBLE"
        )
        write_partitioned(base, path, ["day"])
        fix = spark.createDataFrame([(2, "d2", 9.0)], "id LONG, day STRING, v DOUBLE")
        backfill_partitions(fix, path, ["day"])
        backfill_partitions(fix, path, ["day"])
        got = sorted(
            (r["id"], r["v"]) for r in spark.read.parquet(path).collect()
        )
        assert got == [(1, 1.0), (2, 9.0)]


class TestSortedCompaction:
    def test_files_are_disjoint_and_sorted(self, spark, tmp_path):
        from concurrent_etl_spark.sources.warehouse import compact_small_files
        from pyspark.sql import functions as F

        path = str(tmp_path / "t")
        spark.range(0, 10000).withColumn(
            "k", (F.col("id") * 7919) % 10000
        ).repartition(16).write.parquet(path)

        n = compact_small_files(spark, path, target_file_bytes=50_000,
                                sort_cols=["k"])
        assert n >= 2

        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min("k").alias("lo"), F.max("k").alias("hi"),
                 F.count("*").alias("cnt"))
            .collect()
        )
        spans = sorted((r["lo"], r["hi"]) for r in per_file)
        # range partitioning => file key ranges are disjoint
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b <= c, spans
        assert sum(r["cnt"] for r in per_file) == 10000


class TestZorder:
    def _rowgroups_surviving(self, path, xcol, xlo, xhi, ycol, ylo, yhi):
        """Count parquet row groups whose min/max stats intersect the
        2D box — exactly the skipping decision a stats-based reader
        makes before touching data pages."""
        import glob

        import pyarrow.parquet as pq

        survive = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                total += 1
                sx = md.row_group(rg).column(names[xcol]).statistics
                sy = md.row_group(rg).column(names[ycol]).statistics
                if (sx.min <= xhi and sx.max >= xlo
                        and sy.min <= yhi and sy.max >= ylo):
                    survive += 1
        return survive, total

    def test_zorder_skips_more_rowgroups_than_linear_sort(
        self, spark, tables, tmp_path
    ):
        import random

        from concurrent_etl_spark.sources.warehouse import write_zordered

        # two independent uniform dims, small row groups so each file
        # holds several — skipping granularity is the row group
        rng = random.Random(7)
        rows = [(rng.randrange(4096), rng.randrange(4096)) for _ in range(40_000)]
        df = spark.createDataFrame(rows, "x bigint, y bigint")
        spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
        zpath = str(tmp_path / "zord")
        lpath = str(tmp_path / "linear")
        rg_conf = {"parquet.block.size": 64 * 1024}
        # z-ordered layout
        write_zordered(df, zpath, ["x", "y"], bits=12, n_files=4)
        # linear layout: range-partition + sort by x only
        (
            df.repartitionByRange(4, "x")
            .sortWithinPartitions("x", "y")
            .write.mode("overwrite")
            .option("parquet.block.size", 64 * 1024)
            .parquet(lpath)
        )
        # re-write zordered with small row groups too (write_zordered
        # has no option hook; rewrite preserving order)
        (
            spark.read.parquet(zpath)
            .coalesce(4)
            .write.mode("overwrite")
            .option("parquet.block.size", 64 * 1024)
            .parquet(str(tmp_path / "zord_rg"))
        )
        # predicate on the NON-lead dimension: the x-sorted layout
        # cannot prune at all (every row group spans the full y
        # range), while z-order bounds y in every curve segment —
        # this is the multi-dimensional claim, and it is robust at
        # any row-group count (a 1D sort still wins on its own lead
        # column; z-order's value is balanced pruning on ALL
        # interleaved dims)
        ylo, yhi = 2000, 2200  # ~5% of the y domain
        zs, zt = self._rowgroups_surviving(
            str(tmp_path / "zord_rg"), "y", ylo, yhi, "y", ylo, yhi
        )
        ls, lt = self._rowgroups_surviving(
            lpath, "y", ylo, yhi, "y", ylo, yhi
        )
        assert zt > 4 and lt > 4
        assert ls == lt  # 1D layout: zero pruning on y
        assert zs / zt < 1.0  # z-order: real skipping on y
        assert zs / zt < ls / lt
        # correctness: the clustered copy returns identical rows
        got = (
            spark.read.parquet(zpath)
            .where(f"y BETWEEN {ylo} AND {yhi}")
            .collect()
        )
        exp = [r for r in rows if ylo <= r[1] <= yhi]
        assert sorted((r["x"], r["y"]) for r in got) == sorted(exp)

    def test_zorder_key_interleaves_bits(self, spark):
        from concurrent_etl_spark.sources.warehouse import zorder_key

        df = spark.createDataFrame(
            [(0b1010, 0b0110)], "x bigint, y bigint"
        ).select(zorder_key(["x", "y"], bits=4).alias("z"))
        # x bits at even positions, y bits at odd:
        # x=1010 -> bits (0,1,0,1) at pos 0,2,4,6 ; y=0110 -> pos 1,3,5,7
        expected = (0 << 0 | 1 << 2 | 0 << 4 | 1 << 6) | (
            0 << 1 | 1 << 3 | 1 << 5 | 0 << 7
        )
        assert df.collect()[0]["z"] == expected


class TestVersionedSnapshots:
    def test_time_travel_and_immutability(self, spark, tmp_path):
        """Each write is a new immutable version; old snapshots stay
        byte-identical on disk and readable after later writes; the
        pointer advance is atomic (write-temp + rename)."""
        import glob
        import os

        from concurrent_etl_spark.sources.warehouse import (
            latest_version,
            read_snapshot,
            versioned_write,
        )

        path = str(tmp_path / "tbl")
        v1 = versioned_write(
            spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
            path,
        )
        files_v1 = {
            f: os.stat(f).st_mtime_ns
            for f in glob.glob(f"{path}/v=1/*.parquet")
        }
        v2 = versioned_write(
            spark.createDataFrame(
                [(1, "a"), (2, "B"), (3, "c")], "k int, v string"
            ),
            path,
        )
        assert (v1, v2) == (1, 2)
        assert latest_version(path) == 2
        # time travel: v1 still reads the old rows
        old = {(r["k"], r["v"]) for r in read_snapshot(spark, path, 1).collect()}
        assert old == {(1, "a"), (2, "b")}
        latest = {
            (r["k"], r["v"]) for r in read_snapshot(spark, path).collect()
        }
        assert latest == {(1, "a"), (2, "B"), (3, "c")}
        # immutability: v1 files untouched by the v2 write
        assert files_v1 == {
            f: os.stat(f).st_mtime_ns
            for f in glob.glob(f"{path}/v=1/*.parquet")
        }

    def test_snapshot_diff_categories(self, spark, tmp_path):
        from concurrent_etl_spark.sources.warehouse import (
            snapshot_diff,
            versioned_write,
        )

        path = str(tmp_path / "tbl")
        versioned_write(
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (4, "d")], "k int, v string"
            ),
            path,
        )
        versioned_write(
            spark.createDataFrame(
                [(1, "a"), (2, "B"), (3, "c")], "k int, v string"
            ),
            path,
        )
        d = {
            (r["op"], r["k"])
            for r in snapshot_diff(spark, path, 1, 2, ["k"]).collect()
        }
        assert d == {("added", 3), ("removed", 4), ("changed", 2)}

    def test_vacuum_retains_window_and_latest(self, spark, tmp_path):
        from concurrent_etl_spark.sources.warehouse import (
            read_snapshot,
            vacuum_snapshots,
            versioned_write,
        )

        path = str(tmp_path / "tbl")
        for i in range(5):
            versioned_write(
                spark.createDataFrame([(i,)], "k int"), path
            )
        removed = vacuum_snapshots(path, keep_last=2)
        assert removed == [1, 2, 3]
        # retained window still reads
        assert read_snapshot(spark, path, 4).collect()[0]["k"] == 3
        assert read_snapshot(spark, path).collect()[0]["k"] == 4
        import pytest as _pytest

        with _pytest.raises(Exception):
            read_snapshot(spark, path, 1).collect()
