"""Unit tests for the scalar function surface (SURVEY §2.5).

Covers the pandas-divergent edges SURVEY §5 calls out: cast-failure
semantics (F3), date/time coercion (F9/F10), string slicing on short
inputs (F8).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def _one_col(spark, values, name="v"):
    return spark.createDataFrame([(v,) for v in values], [name])


class TestStagedCast:
    def test_int_ok(self, spark):
        df = _one_col(spark, ["42", "-7", None])
        out = [r[0] for r in df.select(staged_cast("v", "int")).collect()]
        assert out == [42, -7, None]

    def test_int_garbage_coerces_to_null(self, spark):
        df = _one_col(spark, ["42", "garbage", "3.9"])
        out = [r[0] for r in df.select(staged_cast("v", "int")).collect()]
        assert out[0] == 42
        assert out[1] is None

    def test_int_garbage_strict_raises(self, spark):
        df = _one_col(spark, ["garbage"])
        with pytest.raises(Exception, match="CAST_INVALID_INPUT|cannot be cast"):
            df.select(staged_cast("v", "int", strict=True)).collect()

    def test_float(self, spark):
        df = _one_col(spark, ["1.5", "bad", None])
        out = [r[0] for r in df.select(staged_cast("v", "float")).collect()]
        assert out == [1.5, None, None]


class TestDateTimeParse:
    def test_parse_date_coerce(self, spark):
        df = _one_col(spark, ["2024-03-01", "not-a-date", None])
        out = [r[0] for r in df.select(parse_date("v")).collect()]
        assert str(out[0]) == "2024-03-01"
        assert out[1] is None and out[2] is None

    def test_parse_time_of_day(self, spark):
        df = _one_col(spark, ["08:15:59", "25:99:99", None])
        out = [r[0] for r in df.select(parse_time_of_day("v")).collect()]
        assert out == ["08:15:59", None, None]

    def test_to_typed_combined(self, spark):
        df = spark.createDataFrame(
            [("7", "1.25", "2024-05-06 garbage tail", "xx 23:59:58")],
            ["i", "f", "d", "t"],
        )
        row = to_typed(
            df, int_cols=["i"], float_cols=["f"], date_cols=["d"], time_cols=["t"]
        ).collect()[0]
        assert row["i"] == 7
        assert row["f"] == 1.25
        assert str(row["d"]) == "2024-05-06"
        assert row["t"] == "23:59:58"


class TestStrings:
    def test_path_stem_both_separators(self, spark):
        df = _one_col(
            spark,
            [
                "/data/sample/export_12_OPERATIONS.xlsx",
                "C:\\data\\sample\\file_CONFIRMATION.xlsx",
                "bare_OPERATIONS.csv",
            ],
        )
        out = [r[0] for r in df.select(path_stem("v")).collect()]
        assert out == ["export_12_OPERATIONS", "file_CONFIRMATION", "bare_OPERATIONS"]

    def test_template_token(self, spark):
        df = _one_col(spark, ["export_12_OPERATIONS", "file_CONFIRMATION", "notoken"])
        out = [r[0] for r in df.select(template_token("v")).collect()]
        assert out == ["OPERATIONS", "CONFIRMATION", "notoken"]

    def test_slicing(self, spark):
        df = _one_col(spark, ["WC1234-01"])
        row = df.select(
            first_chars("v", 2).alias("a"),
            last_chars("v", 2).alias("b"),
            drop_last_chars("v", 3).alias("c"),
        ).collect()[0]
        assert (row["a"], row["b"], row["c"]) == ("WC", "01", "WC1234")

    def test_drop_last_chars_short_string(self, spark):
        # pandas s.str[:-3] on a 2-char string -> '' (not NULL)
        df = _one_col(spark, ["ab"])
        assert df.select(drop_last_chars("v", 3)).collect()[0][0] == ""
