"""Physical table layout: bucketing and partitioning for shuffle-free
joins and partition pruning.

The reference re-reads and re-joins its master tables per 1000-row
chunk over JDBC (``case_2/Normal.py:58,232-236``) — layout is the
database's problem. In a 100 TB lake the layout IS the optimization:

  * bucketing (hash-cluster by join key at write time) makes every
    later join/aggregation on that key shuffle-free — the cost is paid
    once at ingest instead of on every query;
  * partitioning (directory per key value) turns selective filters
    into directory pruning — the scan never opens non-matching files.

Both compose with AQE; neither needs Hive (the session catalog tracks
bucket metadata for the lifetime of the SparkSession, a metastore
makes it durable on a real deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Write df as a bucketed (optionally sorted) external parquet table.

    Matching bucket counts on both sides of a join remove both
    Exchanges; matching sortBy additionally removes the Sorts under a
    sort-merge join. Choose n_buckets so one bucket of the largest
    table fits an executor core's working set (128-512 MB parquet).
    """
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Write df partitioned by directory (hive-style key=value layout).

    Filters on partition_cols become partition pruning: the file index
    drops directories before any parquet footer is read. Keep
    cardinality modest (dates, regions — not high-cardinality ids,
    which belong in bucketing)."""
    df.write.format("parquet").mode("overwrite").partitionBy(
        *partition_cols
    ).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~target-sized files.

    Streaming micro-batches (one file per trigger per partition) and
    fine-grained merges accumulate small files; at 100 TB the scan
    cost becomes dominated by per-file open/footer overhead rather
    than bytes. Sizing by measured on-disk bytes (not row counts)
    keeps the result stable across schema width. Uses an atomic
    staging-directory swap so readers never observe a half-compacted
    table. Returns the new file count.
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    files = _glob.glob(_os.path.join(path, "*.parquet"))
    total = sum(_os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))  # ceil-div
    staged = path.rstrip("/") + "._compact_tmp"
    df = spark.read.parquet(path)
    if sort_cols:
        # range-partition + sort within files: parquet row-group
        # min/max stats on sort_cols become tight and disjoint, so
        # later range/point predicates skip whole files and row
        # groups — the poor man's clustering key, paid once at
        # compaction time
        df = df.repartitionByRange(int(n_out), *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.repartition(int(n_out))
    df.write.mode("overwrite").parquet(staged)
    backup = path.rstrip("/") + "._compact_old"
    _os.rename(path, backup)
    _os.rename(staged, path)
    _shutil.rmtree(backup)
    return len(_glob.glob(_os.path.join(path, "*.parquet")))


def backfill_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Idempotent backfill: replace ONLY the hive partitions present
    in ``df``, leaving every other partition untouched.

    ``partitionOverwriteMode=dynamic`` scopes the overwrite to the
    partitions the batch actually contains — the standard
    reprocess-one-day pattern. With the default (static) mode the
    same call would truncate the whole table first: the difference
    between an idempotent backfill and a data-loss incident. The
    conf is set per-write via the writer option, so the session
    default stays untouched.

    Reference parity: the reference's recovery story is "delete the
    Temp table and re-run the whole batch" (case_2/Normal.py:276,
    311-323) — partition-scoped overwrite is that, minus the full
    truncate, at any scale: a 100 TB table backfills one day by
    rewriting one directory.
    """
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def zorder_key(cols: list[str], bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` bits of each
    column, entirely in JVM bitwise expressions (codegen-friendly, no
    Python). Sorting by this key clusters rows that are close in ALL
    dimensions at once, so parquet row-group min/max stats stay tight
    on EVERY interleaved column — a multi-column predicate then skips
    row groups that a single-column sort could only skip for its lead
    column. This is the same layout idea Delta's OPTIMIZE ZORDER BY
    applies, expressed with stock Spark functions.

    Columns must be non-negative integers (callers rank/bucket real
    values first — ranking also equalizes scales, which raw bit
    interleaving needs to be meaningful).
    """
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    n = len(cols)
    key: Column = F.lit(0).cast("bigint")
    for b in range(bits):
        for c, col in enumerate(cols):
            bit = F.shiftright(F.col(col).cast("bigint"), b).bitwiseAND(
                F.lit(1)
            )
            key = key.bitwiseOR(
                F.shiftleft(bit, b * n + c).cast("bigint")
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Rewrite df clustered along the Z-order curve of ``cols``.

    repartitionByRange on the Morton key gives each output file a
    contiguous curve segment (disjoint key ranges across files);
    sortWithinPartitions orders row groups inside each file. After
    this, a conjunctive range predicate over the interleaved columns
    prunes at BOTH granularities via plain parquet min/max stats —
    no table format or index needed, so the pattern works on any
    object store at 100 TB.
    """
    zk = zorder_key(cols, bits).alias("__zkey")
    (
        df.select("*", zk)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def versioned_write(df: DataFrame, path: str) -> int:
    """Append an immutable snapshot version of ``df`` under
    ``path/v=N`` and atomically advance the ``_LATEST`` pointer.

    A minimal time-travel layout on plain parquet: every write is a
    new immutable directory (old versions are never touched — the
    property that makes concurrent readers safe without locks), and
    the pointer file is the only mutable object, updated by
    write-to-temp + rename (atomic on POSIX). This is the essence of
    what Delta/Iceberg's transaction log provides, minus multi-writer
    coordination — single-writer semantics, like the engine's merge
    path. Returns the new version number.
    """
    import os as _os
    import shutil as _shutil

    _os.makedirs(path, exist_ok=True)
    current = latest_version(path)
    v = current + 1
    vdir = _os.path.join(path, f"v={v}")
    if _os.path.isdir(vdir):
        # orphan from a crash after the data write but before the
        # pointer rename: the pointer never advanced, so the dir is
        # invisible to every reader — safe to clear and retry
        # (single-writer semantics, like the rest of the layer)
        _shutil.rmtree(vdir)
    df.write.mode("errorifexists").parquet(vdir)
    tmp = _os.path.join(path, "._LATEST_tmp")
    with open(tmp, "w") as f:
        f.write(str(v))
    _os.replace(tmp, _os.path.join(path, "_LATEST"))
    return v


def latest_version(path: str) -> int:
    """Current snapshot version (0 = no snapshot yet)."""
    import os as _os

    p = _os.path.join(path, "_LATEST")
    if not _os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip())


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the table as of ``version`` (default:
    latest). Because versions are immutable directories, reading an
    old snapshot during a concurrent ``versioned_write`` is always
    consistent — the new version is invisible until the pointer
    rename lands."""
    import os as _os

    v = latest_version(path) if version is None else version
    if v < 1:
        raise FileNotFoundError(f"no snapshot in {path}")
    return spark.read.parquet(_os.path.join(path, f"v={v}"))


def snapshot_diff(
    spark: SparkSession, path: str, v_old: int, v_new: int, keys: list[str]
) -> DataFrame:
    """Row-level diff between two snapshots: (op, *keys) with op in
    'added' / 'removed' / 'changed'. The audit query every versioned
    table owes its operators — computed with two anti-joins and one
    hash-compare join, never a full-width cross compare."""
    from pyspark.sql import functions as F

    old = read_snapshot(spark, path, v_old)
    new = read_snapshot(spark, path, v_new)
    val_cols = [c for c in new.columns if c not in keys]
    h = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in val_cols]))
    o = old.select(*keys, h.alias("h_old"))
    n = new.select(*keys, h.alias("h_new"))
    added = n.join(o.select(*keys), keys, "left_anti").select(
        F.lit("added").alias("op"), *keys
    )
    removed = o.join(n.select(*keys), keys, "left_anti").select(
        F.lit("removed").alias("op"), *keys
    )
    changed = (
        n.join(o, keys)
        .where(F.col("h_new") != F.col("h_old"))
        .select(F.lit("changed").alias("op"), *keys)
    )
    return added.unionByName(removed).unionByName(changed)


def vacuum_snapshots(path: str, keep_last: int = 3) -> list[int]:
    """Retention cleanup: delete snapshot versions older than the
    newest ``keep_last``, never touching the current pointer's
    version. Returns the removed version numbers. The time-travel
    window is exactly the retained set — the same storage/lookback
    trade a Delta VACUUM makes, minus distributed-lock ceremony
    (single-writer semantics, like the rest of the layout layer)."""
    import os as _os
    import re as _re
    import shutil as _shutil

    latest = latest_version(path)
    versions = sorted(
        int(m.group(1))
        for d in _os.listdir(path)
        if (m := _re.fullmatch(r"v=(\d+)", d))
    )
    doomed = [v for v in versions[:-keep_last] if v != latest]
    for v in doomed:
        _shutil.rmtree(_os.path.join(path, f"v={v}"))
    return doomed
