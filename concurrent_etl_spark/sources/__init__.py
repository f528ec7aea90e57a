"""Sources & sinks (SURVEY.md §2.1, S1-S10).

Canonical correctness path is file-native (parquet/CSV); external
systems (JDBC warehouse, Excel exports) sit behind thin adapters so
every pipeline is testable without a database or xlsx codec.
"""

from concurrent_etl_spark.sources.files import (
    csv_append_sink,
    read_csv_staged,
    read_parquet,
    staging_overwrite,
)
from concurrent_etl_spark.sources.jdbc import JdbcAdapter
from concurrent_etl_spark.sources.excel import read_excel_dir

__all__ = [
    "csv_append_sink",
    "read_csv_staged",
    "read_parquet",
    "staging_overwrite",
    "JdbcAdapter",
    "read_excel_dir",
]
