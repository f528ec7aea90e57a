"""Custom Python DataSource over the transaction-log table format.

Spark 4's Python DataSource API is the engine's EXTENSION surface —
the sanctioned way to plug a new format/connector into the scan
planner without JVM code. This module registers ``ces_txn``: the
repo's commit-log tables (``sources/txn.py``) become a first-class
``spark.read.format("ces_txn")`` source with

  * file-per-partition scan parallelism (one InputPartition per
    parquet data file — the split unit a distributed scan needs);
  * Arrow batch transfer (``read`` yields pyarrow RecordBatches, so
    rows never materialize as Python objects);
  * FILTER PUSHDOWN through ``pushFilters`` — supported comparisons
    are evaluated by pyarrow at the file scan (row-group statistics
    prune), unsupported residuals stay with Spark. This is the same
    split-responsibility contract a JDBC or Delta connector
    implements;
  * time travel via ``option("version", N)``;
  * a CHANGE-DATA-FEED streaming reader: every commit-log version is
    a micro-batch offset, so a downstream pipeline can subscribe to
    a dimension table's history (``readStream.format("ces_txn")``)
    with checkpoint-exact offsets. Driver-side reads, per the
    SimpleDataSourceStreamReader contract — right-sized for
    dimension/metadata tables, by design (the API's documented
    lightweight path; a partition-planned DataSourceStreamReader is
    the high-throughput upgrade, same offsets).

Reference parity: the reference's only extension point is "another
pandas read_* call" (case_1/NormalETL.py:26); a pluggable scan
provider with pushdown is what an engine offers instead.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from concurrent_etl_spark.sources.txn import (
    _data_dir_of,
    _log_dir,
    _unique_suffix,
    txn_latest,
)


class _FilePartition(InputPartition):
    def __init__(self, file_path: str):
        self.file_path = file_path


def _pa_schema_to_spark(pa_schema) -> StructType:
    import pyarrow as pa  # noqa: F401
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(pa_schema)


class TxnTableReader(DataSourceReader):
    """Batch reader: one partition per data file, pyarrow scan with
    pushed-down predicate evaluation (row-group stats pruning)."""

    def __init__(self, path: str, version: int | None):
        v = txn_latest(path) if version is None else version
        if v < 1:
            raise FileNotFoundError(f"no committed version in {path}")
        self._table_path = path
        self._data_dir = _data_dir_of(path, v)
        self._pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept the comparisons pyarrow can evaluate at the scan;
        everything else is returned to Spark as a residual. Spark
        ALSO re-applies accepted filters unless told otherwise — the
        pushdown is a scan-cost optimization, never a correctness
        dependency."""
        supported = (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            IsNotNull,
        )
        for f in filters:
            # only top-level columns (attribute path of length 1)
            if isinstance(f, supported) and len(f.attribute) == 1:
                self._pushed.append(f)
            else:
                yield f
        # scan-report observability: planning runs in a separate
        # Python worker (class/instance state never reaches the user
        # session) and the v2 plan string does not render
        # Python-source pushdowns — so the accepted predicates are
        # recorded next to the table, where operators and tests can
        # audit what the last planned scan pushed
        try:
            with open(
                os.path.join(self._table_path, "_scan_report"), "w"
            ) as fh:
                fh.write("\n".join(repr(f) for f in self._pushed))
        except OSError:
            pass

    def _arrow_filter(self):
        import pyarrow.compute as pc

        expr = None
        for f in self._pushed:
            col = pc.field(f.attribute[0])
            if isinstance(f, EqualTo):
                e = col == f.value
            elif isinstance(f, GreaterThan):
                e = col > f.value
            elif isinstance(f, GreaterThanOrEqual):
                e = col >= f.value
            elif isinstance(f, LessThan):
                e = col < f.value
            elif isinstance(f, LessThanOrEqual):
                e = col <= f.value
            else:  # IsNotNull
                e = ~col.is_null()
            expr = e if expr is None else (expr & e)
        return expr

    def partitions(self) -> list[InputPartition]:
        files = sorted(
            glob.glob(os.path.join(self._data_dir, "*.parquet"))
        )
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        import pyarrow.dataset as ds

        dataset = ds.dataset(partition.file_path, format="parquet")
        scanner = dataset.scanner(filter=self._arrow_filter())
        yield from scanner.to_reader()


class TxnChangeFeedStreamReader(SimpleDataSourceStreamReader):
    """Change-data-feed: offsets are commit-log versions; each
    micro-batch carries the snapshot rows of every version committed
    since the last checkpointed offset, stamped with
    ``_commit_version`` — replayable exactly (committed versions are
    immutable), which is what gives the checkpoint its exactly-once
    meaning."""

    def __init__(self, path: str):
        self._path = path

    def initialOffset(self) -> dict:
        return {"version": 0}

    def _rows_between(self, lo: int, hi: int):
        import pyarrow.dataset as ds

        for v in range(lo + 1, hi + 1):
            dataset = ds.dataset(_data_dir_of(self._path, v), format="parquet")
            for batch in dataset.to_batches():
                for row in batch.to_pylist():
                    yield (*row.values(), v)

    def read(self, start: dict):
        # materialized list, not a generator: the runner pickles the
        # batch for prefetch/replay caching (driver-side read is the
        # Simple reader's documented trade)
        lo = int(start["version"])
        hi = txn_latest(self._path)
        if hi <= lo:
            return [], {"version": lo}
        return list(self._rows_between(lo, hi)), {"version": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(
            self._rows_between(int(start["version"]), int(end["version"]))
        )


class TxnTableDataSource(DataSource):
    """``format("ces_txn")``: batch (+ time travel) and change-feed
    streaming reads over a commit-log table. Options: ``path``
    (required), ``version`` (batch time travel)."""

    @classmethod
    def name(cls) -> str:
        return "ces_txn"

    def _resolved_schema_source(self) -> str:
        path = self.options["path"]
        version = self.options.get("version")
        v = txn_latest(path) if version is None else int(version)
        if v < 1:
            raise FileNotFoundError(f"no committed version in {path}")
        return _data_dir_of(path, v)

    def schema(self) -> StructType:
        import pyarrow.dataset as ds

        from pyspark.sql.types import LongType, StructField

        dataset = ds.dataset(self._resolved_schema_source(), format="parquet")
        base = _pa_schema_to_spark(dataset.schema)
        if self.options.get("changefeed", "false").lower() == "true":
            # streaming rows are stamped with the commit version;
            # set .option("changefeed", "true") on readStream
            return StructType(
                [*base.fields, StructField("_commit_version", LongType())]
            )
        return base

    def reader(self, schema: StructType) -> TxnTableReader:
        version = self.options.get("version")
        return TxnTableReader(
            self.options["path"],
            None if version is None else int(version),
        )

    def simpleStreamReader(self, schema: StructType) -> TxnChangeFeedStreamReader:
        return TxnChangeFeedStreamReader(self.options["path"])

    def writer(self, schema: StructType, overwrite: bool):
        if not overwrite:
            raise ValueError(
                "ces_txn commits immutable snapshot versions: use "
                "mode('overwrite') for a new version, txn_merge for "
                "read-modify-write"
            )
        os.makedirs(_log_dir(self.options["path"]), exist_ok=True)
        return TxnTableWriter(self.options["path"], schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return TxnStreamWriter(self.options["path"], schema)


def register(spark) -> None:
    """Idempotent registration of the ces_txn format on a session.

    Also pins the shared session confs on the CALLER's session: Spark
    4 hard-errors (``DATA_SOURCE_PUSHDOWN_DISABLED``) when a Python
    DataSource reader implements ``pushFilters()`` while
    ``spark.sql.python.filterPushdown.enabled`` is false — the round-3
    driver failure, where the driver's own default session lacked the
    conf the engine session sets at build time. All pins are SQLConf
    (runtime-settable); see ``engine.SESSION_PINS``.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    from concurrent_etl_spark.engine import pin_session_confs

    pin_session_confs(spark)
    try:
        spark.dataSource.register(TxnTableDataSource)
    except AnalysisException as e:
        # Spark 4.1 asymmetry (observed here): the duplicate check in
        # registerPython consults state shared across sessions, while
        # format-name LOOKUP consults the per-session
        # sessionState.dataSourceManager. A newSession() of a session
        # that already registered therefore gets ALREADY_EXISTS on
        # register yet DATA_SOURCE_NOT_FOUND on read. Recover by
        # probing THIS session's manager and, if the name is truly
        # absent there, registering straight into it — the same
        # UserDefinedPythonDataSource construction pyspark's
        # register() performs, minus the shared duplicate check.
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise
        try:
            mgr = spark._jsparkSession.sessionState().dataSourceManager()
            if mgr.dataSourceExists(TxnTableDataSource.name()):
                return  # genuinely registered on this session
            from pyspark.sql.udf import _wrap_function

            sc = spark.sparkContext
            wrapped = _wrap_function(sc, TxnTableDataSource)
            jds = getattr(
                sc._jvm,
                "org.apache.spark.sql.execution.datasources.v2."
                "python.UserDefinedPythonDataSource",
            )(wrapped)
            mgr.registerDataSource(TxnTableDataSource.name(), jds)
        except AnalysisException:
            raise
        except Exception:
            # Spark Connect (no _jsparkSession) or private-API drift:
            # the shared-check says registered — proceed and let the
            # read surface any real resolution failure.
            pass


class _FileCommit(WriterCommitMessage):
    def __init__(self, file_path: str, n_rows: int):
        self.file_path = file_path
        self.n_rows = n_rows


class TxnTableWriter(DataSourceWriter):
    """Distributed TRANSACTIONAL write through the connector: each
    task streams its rows into one parquet file inside an anonymous
    staged data directory (Arrow writer, file-per-task — the same
    physical layout any distributed sink produces), and the final
    ``commit`` publishes the directory as the next version with the
    commit-log CAS. Two-phase semantics for free: a failed/aborted
    write leaves only an unreferenced orphan (``txn_vacuum`` GC),
    never a torn table — and ``abort`` proactively removes it.

    Snapshot (overwrite) semantics only: a log-structured table's
    data dirs are immutable, so "append" would require a read-modify
    -write cycle — that is ``txn_merge``'s job, by design.
    """

    def __init__(self, path: str, schema: StructType):
        from pyspark.sql.pandas.types import to_arrow_schema

        self._path = path
        self._dirname = f"d-{_unique_suffix()}"
        self._arrow_schema = to_arrow_schema(schema)
        os.makedirs(os.path.join(path, self._dirname), exist_ok=True)

    def write(self, iterator) -> _FileCommit:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.taskcontext import TaskContext

        tid = TaskContext.get().partitionId()
        fpath = os.path.join(
            self._path, self._dirname, f"part-{tid:05d}.parquet"
        )
        rows = [tuple(r) for r in iterator]
        cols = list(zip(*rows)) if rows else [[] for _ in self._arrow_schema]
        table = pa.Table.from_arrays(
            [
                pa.array(c, type=f.type)
                for c, f in zip(cols, self._arrow_schema)
            ],
            schema=self._arrow_schema,
        )
        pq.write_table(table, fpath)
        return _FileCommit(fpath, len(rows))

    def commit(self, messages) -> None:
        import time as _time

        for _ in range(20):
            v = txn_latest(self._path) + 1
            try:
                fd = os.open(
                    os.path.join(_log_dir(self._path), str(v)),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
            except FileExistsError:
                _time.sleep(0.02)
                continue
            try:
                os.write(fd, self._dirname.encode())
            finally:
                os.close(fd)
            return
        raise RuntimeError(f"lost 20 commit races on {self._path}")

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(
            os.path.join(self._path, self._dirname), ignore_errors=True
        )


class TxnStreamWriter(DataSourceStreamWriter):
    """Streaming sink INTO the commit-log table: every micro-batch
    commits one table version with APPEND semantics — the new
    snapshot is the previous one (files carried forward as
    hardlinks, the manifest trick) plus the batch — the write-side
    mirror of the change-feed reader, closing the loop (stream in,
    transactional versions out, history queryable mid-stream).

    Exactly-once versions under checkpoint replay: tasks stage files
    under ``_staging`` and ``commit`` records the batch id in
    ``_batches/<id>`` BEFORE claiming the version; a replayed batch
    finds its marker, discards its re-staged files, and commits
    nothing — so a crash/restart never yields a duplicate version of
    the same input batch. ``abort`` removes the staged files.
    """

    def __init__(self, path: str, schema: StructType):
        from pyspark.sql.pandas.types import to_arrow_schema

        self._path = path
        self._arrow_schema = to_arrow_schema(schema)
        os.makedirs(os.path.join(path, "_staging"), exist_ok=True)
        os.makedirs(os.path.join(path, "_batches"), exist_ok=True)
        os.makedirs(_log_dir(path), exist_ok=True)

    def write(self, iterator) -> _FileCommit:
        import pyarrow as pa
        import pyarrow.parquet as pq

        fpath = os.path.join(
            self._path, "_staging", f"f-{_unique_suffix()}.parquet"
        )
        rows = [tuple(r) for r in iterator]
        cols = list(zip(*rows)) if rows else [[] for _ in self._arrow_schema]
        table = pa.Table.from_arrays(
            [
                pa.array(c, type=f.type)
                for c, f in zip(cols, self._arrow_schema)
            ],
            schema=self._arrow_schema,
        )
        pq.write_table(table, fpath)
        return _FileCommit(fpath, len(rows))

    def commit(self, messages, batchId: int) -> None:
        import time as _time

        staged = [m.file_path for m in messages if m is not None]
        marker = os.path.join(self._path, "_batches", str(batchId))
        if os.path.exists(marker):
            # checkpoint replay of an already-committed batch: the
            # version exists; drop the re-staged duplicates
            for f in staged:
                try:
                    os.remove(f)
                except OSError:
                    pass
            return
        dirname = f"d-{_unique_suffix()}"
        ddir = os.path.join(self._path, dirname)
        os.makedirs(ddir)
        for f in staged:
            os.rename(f, os.path.join(ddir, os.path.basename(f)))
        # APPEND semantics: the new version's snapshot is the previous
        # snapshot plus this batch. Prior files are HARDLINKED, not
        # copied — exactly how a manifest-based table format carries
        # unchanged files forward (zero data movement, and vacuum of
        # an old version never corrupts a newer one: links share
        # immutable inodes, directories stay independent)
        prev = txn_latest(self._path)
        if prev >= 1:
            pdir = _data_dir_of(self._path, prev)
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    os.link(
                        os.path.join(pdir, f), os.path.join(ddir, f)
                    )
        for _ in range(20):
            v = txn_latest(self._path) + 1
            try:
                fd = os.open(
                    os.path.join(_log_dir(self._path), str(v)),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
            except FileExistsError:
                _time.sleep(0.02)
                continue
            try:
                os.write(fd, dirname.encode())
            finally:
                os.close(fd)
            with open(marker, "w") as fh:
                fh.write(str(v))
            return
        raise RuntimeError(f"lost 20 commit races on {self._path}")

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(m.file_path)
                except OSError:
                    pass
