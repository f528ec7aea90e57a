"""Typed casts over all-string staging columns (F3-F11).

The reference stages every Excel file all-string (``dtype=str``,
case_2/Normal.py:93) and then casts column-by-column:

  * ``astype(int)``   — hard error on garbage (case_2/Normal.py:177-179)
  * ``astype(float)`` — case_2/Normal.py:182-184
  * ``pd.to_datetime(..., errors='coerce')`` — invalid -> NaT -> None
    (case_2/Normal.py:187-191 dates, :194-198 times-of-day)

Spark mapping: ``cast`` under ANSI mode reproduces the hard error;
``try_cast``-style (non-ANSI cast / to_date) reproduces ``coerce``.
We default to coerce semantics (nulls) because a 100 TB pipeline
wants dead-lettering, not a driver crash; ``strict=True`` opts into
ANSI-style raising via try_cast + assertion.

Spark has no time-of-day type, so HH:mm:ss survives as a canonical
zero-padded string (parse -> reformat -> null on garbage), matching
the reference's ``datetime.time`` column semantics for equality and
ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: staging type tag -> Spark cast target
_TYPE_MAP = {
    "int": "bigint",
    "long": "bigint",
    "float": "double",
    "double": "double",
    "str": "string",
    "string": "string",
}


def parse_date(col: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """String -> DateType, invalid -> NULL (pandas errors='coerce', F9).

    The reference isolates the first 10 chars before parsing
    (case_2/Normal.py:191); callers compose with
    ``strings.first_chars`` when the source has a timestamp tail.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)).cast("date")


def parse_time_of_day(col: Column | str, fmt: str = "HH:mm:ss") -> Column:
    """String -> canonical 'HH:mm:ss' string, invalid -> NULL (F10).

    Spark has no TimeType; parse to timestamp then reformat, which
    both validates and zero-pads. NaT->None (F11) is native NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.try_to_timestamp(c, F.lit(fmt)), "HH:mm:ss")


def staged_cast(col: Column | str, type_tag: str, strict: bool = False) -> Column:
    """Cast an all-string staging column to its target type (F3-F5).

    strict=False: garbage -> NULL (try_cast / pandas coerce).
    strict=True : ANSI cast — garbage raises at execution time, the
    behaviour of pandas ``astype(int)`` the reference relied on.
    """
    c = F.col(col) if isinstance(col, str) else col
    target = _TYPE_MAP[type_tag]
    if strict:
        # plain cast raises on malformed input under ANSI mode
        # (default in Spark 4) — the pandas astype(int) behaviour.
        return c.cast(target)
    return c.try_cast(target)


def to_typed(
    df: DataFrame,
    int_cols: list[str] | None = None,
    float_cols: list[str] | None = None,
    date_cols: list[str] | None = None,
    time_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Apply the reference's staging->typed transform in one pass.

    One ``withColumns`` call => a single Project node for Catalyst,
    not N stacked projections.
    """
    exprs: dict[str, Column] = {}
    for c in int_cols or []:
        exprs[c] = staged_cast(c, "int", strict)
    for c in float_cols or []:
        exprs[c] = staged_cast(c, "float", strict)
    for c in date_cols or []:
        exprs[c] = parse_date(F.substring(F.col(c), 1, 10))
    for c in time_cols or []:
        exprs[c] = parse_time_of_day(F.substring(F.col(c), -8, 8))
    return df.withColumns(exprs) if exprs else df
