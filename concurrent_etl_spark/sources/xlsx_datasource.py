"""xlsx as a first-class Spark data source: spark.read.format("xlsx").

Spark 4's Python DataSource API (pyspark.sql.datasource) is the
idiomatic extension point for formats the JVM has no reader for —
registration makes the Excel adapter (S2) a peer of csv/parquet in
user code instead of a helper function:

    from concurrent_etl_spark.sources.xlsx_datasource import register
    register(spark)
    df = (spark.read.format("xlsx")
          .option("path", "/data/*.xlsx")
          .option("columns", "order_id,scrap_qty")
          .load())

Scale shape: one InputPartition PER FILE, so Spark schedules, retries
and parallelizes file decodes exactly like its native file sources
(memory per task bounded by the largest single file — the same
constraint the reference had per-thread, case_1/NormalETL.py:8-26).
Decode bytes come from the vendored stdlib SpreadsheetML parser
(sources/excel.py), openpyxl-free.

All columns surface as strings plus ``_source_file`` provenance —
the dtype=str staging model (case_2/Normal.py:93); typing is a later
explicit step (functions/casts).
"""

from __future__ import annotations

import glob
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType


@dataclass
class _FilePartition(InputPartition):
    path: str


class XlsxDataSource(DataSource):
    """Options: ``path`` (glob), ``columns`` (comma-separated list)."""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> StructType:
        cols = [
            c.strip()
            for c in self.options.get("columns", "").split(",")
            if c.strip()
        ]
        if not cols:
            raise ValueError(
                "xlsx source requires .option('columns', 'a,b,...') — "
                "the all-string staging projection"
            )
        return StructType(
            [StructField(c, StringType()) for c in cols]
            + [StructField("_source_file", StringType())]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _XlsxReader(self.options, schema)


class _XlsxReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType) -> None:
        self._path = options.get("path", "")
        if not self._path:
            raise ValueError("xlsx source requires .option('path', glob)")
        self._columns = [f.name for f in schema.fields[:-1]]

    def partitions(self) -> list[InputPartition]:
        files = sorted(glob.glob(self._path))
        if not files:
            raise FileNotFoundError(f"no files match {self._path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        # executor-side: decode ONE file per task (vendored parser —
        # no JVM, no openpyxl), project/null-fill to the staging list
        from concurrent_etl_spark.sources.excel import read_xlsx_bytes

        with open(partition.path, "rb") as f:
            pdf = read_xlsx_bytes(f.read())
        for c in self._columns:
            if c not in pdf.columns:
                pdf[c] = None
        pdf = pdf[self._columns]
        for row in pdf.itertuples(index=False, name=None):
            yield (*row, partition.path)


def register(spark: SparkSession) -> None:
    """Register the format for this session (idempotent)."""
    spark.dataSource.register(XlsxDataSource)
