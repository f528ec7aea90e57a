"""File-source micro-batch ETL (T1-T5).

Re-expresses case_2's daemon: watch a directory, process new files
exactly once, maintain dimensions, stage + merge into the fact table.
The hand-rolled done-set (diff of sample/ vs result/ stems,
case_2/Normal.py:304-323) becomes file-source checkpointing; the
DELETE-temp + server-side MERGE (case_2/Normal.py:276-286) becomes a
``foreachBatch`` that overwrites staging and merges into the target
parquet/Delta table inside the batch function.

Scale notes: maxFilesPerTrigger bounds per-batch work (backpressure);
dimension maintenance runs once per micro-batch on the driver plan
(not per partition), which serializes surrogate assignment — the fix
for the reference's read-check-insert race (SURVEY §2.6).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def file_stream_etl(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    transform: Callable[[DataFrame], DataFrame],
    sink_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 6,
    fmt: str = "csv",
    max_files_per_trigger: int = 100,
    available_now: bool = False,
) -> StreamingQuery:
    """readStream(files) -> transform -> append parquet sink.

    The 6-second trigger mirrors SAMPLING_TIME (case_2/Normal.py:18);
    checkpointing replaces the done-set (T2); restart-from-checkpoint
    replaces the retry loop (T3).
    """
    reader = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
    )
    if fmt == "csv":
        reader = reader.option("header", "true")
    stream = reader.load(source_dir)
    out = transform(stream.withColumn("_source_file", F.input_file_name()))
    writer = (
        out.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def merge_into_parquet(
    spark: SparkSession,
    target_dir: str,
    batch: DataFrame,
    keys: list[str],
) -> None:
    """MERGE-style upsert into a parquet table (S9 without the DB).

    Parquet has no transactional MERGE (that's Delta's job on a real
    deployment); this implements last-writer-wins upsert as
    anti-join + union + atomic directory swap — correct for the
    single-writer micro-batch model the engine uses, and replaced
    verbatim by ``MERGE INTO`` when a Delta/Iceberg catalog exists.
    """
    staged = batch.dropDuplicates(keys).persist()
    try:
        if os.path.isdir(target_dir) and any(
            f.endswith(".parquet") for f in os.listdir(target_dir)
        ):
            current = spark.read.parquet(target_dir)
            kept = current.join(staged.select(*keys), keys, "left_anti")
            merged = kept.unionByName(staged)
        else:
            merged = staged
        tmp = target_dir.rstrip("/") + "._staging"
        merged.write.mode("overwrite").parquet(tmp)
        final = spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(target_dir)
    finally:
        staged.unpersist()


def merge_into_snapshot(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    keys: list[str],
) -> int:
    """MERGE as a snapshot COMMIT: the upsert's result is written as
    a new immutable ``v=N`` directory and published by the atomic
    ``_LATEST`` pointer rename — unifying the merge path
    (``merge_into_parquet``) with the versioned table layout
    (``sources/warehouse.py``). Properties the directory-swap merge
    can't give:

      * crash safety — a failure anywhere before the pointer rename
        leaves the previous version live and complete (no
        half-overwritten target window);
      * time travel — every merge is a queryable snapshot;
        ``read_snapshot(path, v)`` reconstructs the table as of any
        retained commit, and ``snapshot_diff`` audits what a merge
        changed;
      * consistent concurrent reads — readers of v=N-1 are never
        disturbed by the v=N write.

    Replaying a micro-batch (checkpoint recovery) re-commits the same
    content as a new version: the pointer advances but the table
    content is identical — idempotent where it matters, with the
    replay visible in history rather than silently absorbed.
    Retention is the operator's dial via ``vacuum_snapshots``.

    Reference parity: the reference delegates MERGE to SQL Server
    (case_2/Normal.py:285-286); this is the lakehouse form — what
    Delta/Iceberg's commit protocol provides, minus multi-writer
    coordination, on plain parquet. Returns the committed version.
    """
    from concurrent_etl_spark.sources.warehouse import (
        latest_version,
        read_snapshot,
        versioned_write,
    )

    staged = batch.dropDuplicates(keys)
    if latest_version(path) >= 1:
        current = read_snapshot(spark, path)
        kept = current.join(staged.select(*keys), keys, "left_anti")
        merged = kept.unionByName(staged)
    else:
        merged = staged
    return versioned_write(merged, path)


def foreach_batch_upsert(
    spark: SparkSession,
    target_dir: str,
    keys: list[str],
    transform: Callable[[DataFrame], DataFrame] | None = None,
    versioned: bool = False,
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch function: transform -> upsert (T4).

    Per micro-batch: the reference's 'DELETE temp tables, load, fire
    merge proc' collapses into one deterministic function call whose
    exactly-once behaviour comes from the checkpoint + idempotent
    merge (re-running a batch re-upserts the same keys).

    With ``versioned=True`` each micro-batch commits through
    ``merge_into_snapshot`` instead of the directory swap: the target
    becomes a versioned table whose history is one snapshot per
    batch — time-travelable, diffable, and crash-safe behind the
    atomic pointer.
    """

    def handle(batch: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        out = transform(batch) if transform is not None else batch
        if versioned:
            merge_into_snapshot(spark, target_dir, out, keys)
        else:
            merge_into_parquet(spark, target_dir, out, keys)

    return handle


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension join — the streaming form of the
    flagship enrich (J1, case_2/Normal.py:232-236 re-expressed).

    The static side is re-planned per micro-batch (so a dim refresh
    between batches is picked up) and broadcast: stream-static joins
    never shuffle the stream and keep no join state, unlike
    stream-stream joins — at 100 TB of stream this is the difference
    between per-batch O(batch) and unbounded state. ``how`` is
    stream-side outer at most ('left'): full/right outer against a
    static side is not defined for streams.
    """
    # broadcast-ok: API contract — `dim` is a dimension table (J1)
    return stream.join(F.broadcast(dim), keys, how)


def merge_additive(
    spark: SparkSession,
    target_dir: str,
    batch: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> None:
    """Incremental aggregation merge: ADD the batch's per-key partial
    sums into a running aggregate table (counts, revenue totals, ...).

    The incremental form of a groupBy().agg() maintained across
    micro-batches: each batch reduces to per-key partials first
    (map-side-combinable, batch-sized), then one key-join against the
    running table adds them in. State is key-cardinality-sized —
    never history-sized — which is what makes a 100 TB/day rollup a
    bounded job. Additivity means replaying a batch DOUBLE-counts:
    pair with checkpointed exactly-once triggers (unlike
    merge_into_parquet, whose last-writer-wins upsert is naturally
    idempotent).
    """
    from pyspark.sql import functions as F

    partial = batch.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    if os.path.isdir(target_dir) and any(
        f.endswith(".parquet") for f in os.listdir(target_dir)
    ):
        current = spark.read.parquet(target_dir)
        merged = (
            current.select(
                *keys, *[F.col(c).alias(f"_cur_{c}") for c in sum_cols]
            )
            .join(partial, keys, "full_outer")
            .select(
                *keys,
                *[
                    (
                        F.coalesce(F.col(f"_cur_{c}"), F.lit(0))
                        + F.coalesce(F.col(c), F.lit(0))
                    ).alias(c)
                    for c in sum_cols
                ],
            )
        )
    else:
        merged = partial
    tmp = target_dir.rstrip("/") + "._staging"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(target_dir)


def merge_into_partitioned_parquet(
    spark: SparkSession,
    target_dir: str,
    batch: DataFrame,
    keys: list[str],
    partition_col: str,
) -> list[str]:
    """Partition-scoped MERGE upsert: rewrite ONLY the hive
    partitions the batch touches, leaving every other partition's
    files physically untouched.

    This is the scale-correct form of ``merge_into_parquet``: that
    one rewrites the whole table per merge (fine for staging-sized
    targets), which at 100 TB turns a 1 GB delta into a 100 TB
    write. Here the delta's partition values are collected (bounded:
    one row per touched partition, never per record), the current
    rows of ONLY those partitions are anti-joined against the
    delta's keys, and ``partitionOverwriteMode=dynamic`` swaps in
    just those directories. History partitions are never read or
    written — the same contract a Delta MERGE with partition
    pruning gives, on plain parquet with a single writer.

    Returns the list of touched partition values (as strings), which
    is also the audit trail a backfill job logs.

    Reference parity: the reference's MERGE proc rewrites whichever
    rows the 1000-row chunk carries (case_2/Normal.py:285-286) —
    per-chunk granularity; partition granularity is what a lake
    needs.
    """
    import shutil

    staged = batch.dropDuplicates(keys).persist()
    try:
        touched = [
            str(r[0])
            for r in staged.select(partition_col).distinct().collect()
        ]
        if not touched:
            # empty delta: zero partitions to rewrite IS the merge —
            # short-circuit before the staging write, whose zero-row
            # directory could not even be read back for the swap
            return []
        exists = os.path.isdir(target_dir) and any(
            not f.startswith("_") for f in os.listdir(target_dir)
        )
        if exists:
            # hive partition discovery re-infers the partition
            # column's type from directory names (dates/ints come
            # back typed) — cast it to the batch's declared type so
            # the anti-join keys and the union line up without a
            # silent coercion
            p_type = dict(batch.dtypes)[partition_col]
            current = (
                spark.read.parquet(target_dir)
                .withColumn(
                    partition_col, F.col(partition_col).cast(p_type)
                )
                .where(F.col(partition_col).isin(touched))
            )
            kept = current.join(staged.select(*keys), keys, "left_anti")
            merged = kept.unionByName(staged)
        else:
            merged = staged
        # materialize the merged partitions to a staging dir FIRST:
        # the merged plan lazily reads target_dir, and a dynamic
        # overwrite that fails mid-commit while its input is the
        # directory being overwritten can lose the touched
        # partitions' prior rows. Staging decouples read from
        # overwrite — the same discipline merge_additive uses.
        tmp = target_dir.rstrip("/") + "._merge_staging"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").parquet(tmp)
        (
            spark.read.parquet(tmp)
            .write.format("parquet")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(target_dir)
        )
        shutil.rmtree(tmp, ignore_errors=True)
        return sorted(touched)
    finally:
        staged.unpersist()
