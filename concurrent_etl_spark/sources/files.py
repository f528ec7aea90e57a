"""File sources/sinks (S1, S2-canonical, S6, S8).

The reference's per-file loop (os.listdir + read per path,
case_1/NormalETL.py:8-9,26) becomes a single glob read — listing is
the source's job, parallelism is partitioning, and per-row provenance
comes back via input_file_name() when the caller wants it.

All-string staging (dtype=str, case_2/Normal.py:93) maps to an
explicit all-StringType schema; types come later via functions.casts
(the staging-then-typing model, SURVEY §1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def all_string_schema(columns: list[str]) -> StructType:
    """The staging schema: every column StringType (dtype=str)."""
    return StructType([StructField(c, StringType()) for c in columns])


def read_csv_staged(
    spark: SparkSession,
    path_or_glob: str,
    columns: list[str] | None = None,
    header: bool = True,
    with_provenance: bool = True,
) -> DataFrame:
    """CSV glob read with all-string staging schema (S1+S2).

    ``columns=None`` infers header names but still forces StringType
    on every column (schema inference for types is deliberately off —
    the reference's staging model makes typing an explicit step).
    """
    reader = spark.read.option("header", str(header).lower())
    if columns is not None:
        df = reader.schema(all_string_schema(columns)).csv(path_or_glob)
    else:
        inferred = reader.csv(path_or_glob)
        df = reader.schema(all_string_schema(inferred.columns)).csv(path_or_glob)
    if with_provenance:
        df = df.withColumn("_source_file", F.input_file_name())
    return df


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Canonical typed source; scan-level pruning/pushdown for free."""
    return spark.read.parquet(path)


def csv_append_sink(df: DataFrame, path: str, header: bool = True) -> None:
    """Append CSV sink (S6, to_csv(mode='a') at case_1/NormalETL.py:36).

    One partitioned write replaces the per-file append loop; the
    'header once then headerless appends' dance disappears (each part
    file carries its own header handled by the reader).
    """
    df.write.mode("append").option("header", str(header).lower()).csv(path)


def staging_overwrite(df: DataFrame, path: str) -> None:
    """Staging-table reset + load in one atomic op (S8).

    DELETE-then-append (case_2/Normal.py:276-277) is just
    mode('overwrite') — the reset stops being a separate failure
    window.
    """
    df.write.mode("overwrite").parquet(path)


def read_jsonl_staged(
    spark: SparkSession,
    path_or_glob: str,
    columns: list[str],
    with_provenance: bool = True,
) -> DataFrame:
    """JSON-lines read with all-string staging + dead-letter capture.

    Same staging model as CSV (every declared column StringType,
    typing is an explicit later step), plus PERMISSIVE-mode corrupt
    record capture: a malformed line lands whole in ``_corrupt``
    with NULLs elsewhere instead of failing the job — the file-level
    analog of the reference's swallow-and-continue daemon loop
    (case_2/Normal.py:334-336), but per-row and auditable. At scale
    the dead-letter rows are filtered to a quarantine sink, never
    re-parsed in the hot path.
    """
    schema = all_string_schema(columns).add("_corrupt", StringType())
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path_or_glob)
    )
    if with_provenance:
        df = df.withColumn("_source_file", F.input_file_name())
    return df


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (Spark-native columnar alternative to parquet).

    ORC ships in stock Spark with the same predicate-pushdown and
    column-pruning surface as parquet (stripe-level min/max + bloom
    indexes), so warehouses standardized on ORC plug into every
    operator here unchanged — the scan layer is the only difference.
    """
    df.write.format("orc").mode("overwrite").save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("orc").load(path)
