"""Scalar function surface (SURVEY.md §2.5, F1-F13).

Everything here is a thin composition of built-in
``pyspark.sql.functions`` — JVM-side, codegen-friendly, never a
Python UDF. These reproduce the reference's hardcoded inline pandas
transforms as reusable Column expressions.
"""

from concurrent_etl_spark.functions.casts import (
    parse_date,
    parse_time_of_day,
    staged_cast,
    to_typed,
)
from concurrent_etl_spark.functions.strings import (
    drop_last_chars,
    first_chars,
    last_chars,
    path_stem,
    template_token,
)

__all__ = [
    "parse_date",
    "parse_time_of_day",
    "staged_cast",
    "to_typed",
    "drop_last_chars",
    "first_chars",
    "last_chars",
    "path_stem",
    "template_token",
]
