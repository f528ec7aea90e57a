"""String/path scalar functions (F1, F2, F6-F8, F13).

The reference's inline pandas string slicing, as Column expressions:

  * path basename+stem       — case_1/NormalETL.py:13
  * suffix token after '_'   — case_1/NormalETL.py:14 (template tag)
  * first 10 chars (date)    — case_2/Normal.py:191
  * last 8 chars (HH:MM:SS)  — case_2/Normal.py:198
  * drop last 3 chars        — case_2/Normal.py:201 (workCentre plant suffix)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def path_stem(col: Column | str) -> Column:
    """'/a/b/FILE_OPERATIONS.xlsx' -> 'FILE_OPERATIONS' (F1).

    Handles both / and \\ separators (the reference split on '\\\\').
    """
    base = F.element_at(F.split(_c(col), r"[/\\]"), -1)
    return F.regexp_replace(base, r"\.[^.]*$", "")


def template_token(col: Column | str) -> Column:
    """Token after the last '_' — the schema-template tag (F2, P4)."""
    return F.element_at(F.split(_c(col), "_"), -1)


def first_chars(col: Column | str, n: int) -> Column:
    """df[c].str[:n] (F6)."""
    return F.substring(_c(col), 1, n)


def last_chars(col: Column | str, n: int) -> Column:
    """df[c].str[-n:] (F7). Unlike pandas, returns NULL on NULL input."""
    return F.substring(_c(col), -n, n)


def drop_last_chars(col: Column | str, n: int) -> Column:
    """df[c].str[:-n] (F8) — empty string when len <= n, like pandas."""
    c = _c(col)
    return F.when(F.length(c) <= n, F.lit("")).otherwise(
        c.substr(F.lit(1), F.length(c) - F.lit(n))
    )
