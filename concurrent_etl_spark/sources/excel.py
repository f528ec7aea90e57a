"""Excel source adapter (S2) — mapInPandas over binary files.

The reference's input format is SAP-exported .xlsx read per-file with
pd.read_excel (case_1/NormalETL.py:26; case_2/Normal.py:93). Spark
has no built-in Excel reader; the production options are the
spark-excel package or this adapter: binaryFile source -> Arrow
batches -> pandas.read_excel per file inside executors. Listing,
scheduling, and retries stay Spark's job; only the byte decode runs
in pandas.

This container ships no xlsx codec (openpyxl), so decoding raises a
clear error unless a codec import succeeds — the correctness path is
file-native CSV/parquet (SURVEY §4 'Excel is an adapter, not core').
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def _excel_codec_available() -> bool:
    try:  # pragma: no cover - depends on environment
        import openpyxl  # noqa: F401

        return True
    except ImportError:
        return False


def read_excel_dir(
    spark: SparkSession,
    path_glob: str,
    columns: list[str],
) -> DataFrame:
    """Read a directory of .xlsx into an all-string staged DataFrame.

    Output schema: ``columns`` (all string, dtype=str semantics) +
    ``_source_file`` provenance. One task per file (binaryFile
    source); memory per task bounded by the largest single file, the
    same constraint the reference had per-thread.
    """
    out_schema = StructType(
        [StructField(c, StringType()) for c in columns]
        + [StructField("_source_file", StringType())]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not _excel_codec_available():  # pragma: no cover
            raise NotImplementedError(
                "xlsx decode needs openpyxl, which this environment does "
                "not ship; use read_csv_staged for the file-native path"
            )
        for pdf in batches:
            for _, row in pdf.iterrows():
                data = pd.read_excel(
                    io.BytesIO(row["content"]), dtype=str, na_values=None
                )
                data = data[[c for c in columns if c in data.columns]]
                for c in columns:
                    if c not in data.columns:
                        data[c] = None
                data = data[columns]
                data["_source_file"] = row["path"]
                yield data

    binary = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return binary.mapInPandas(decode, out_schema)
