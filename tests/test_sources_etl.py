"""Tests for sources (files/jdbc/excel) and the case-1 pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concurrent_etl_spark.operators.etl import (
    CASE1_TEMPLATES,
    case1_pipeline,
    route_templates,
)
from concurrent_etl_spark.sources.excel import read_excel_dir
from concurrent_etl_spark.sources.files import (
    all_string_schema,
    csv_append_sink,
    read_csv_staged,
    staging_overwrite,
)
from concurrent_etl_spark.sources.jdbc import JdbcAdapter


class TestCsvStaged:
    def test_all_columns_string_with_provenance(self, spark, tmp_path):
        src = tmp_path / "sample"
        src.mkdir()
        (src / "a_OPERATIONS.csv").write_text(
            "order_id,scrap_qty,yield_qty,total_qty\nPO1,1,2,3\nPO2,4,5,6\n"
        )
        df = read_csv_staged(spark, str(src), CASE1_TEMPLATES["OPERATIONS"]["source"])
        assert all(t == "string" for c, t in df.dtypes if c != "_source_file")
        assert df.count() == 2
        assert df.select("_source_file").first()[0].endswith("a_OPERATIONS.csv")

    def test_header_inference_still_strings(self, spark, tmp_path):
        p = tmp_path / "f.csv"
        p.write_text("x,y\n1,2.5\n")
        df = read_csv_staged(spark, str(p))
        assert dict(df.dtypes)["x"] == "string"
        assert dict(df.dtypes)["y"] == "string"


class TestCase1Pipeline:
    def _staged(self, spark, tmp_path):
        src = tmp_path / "sample"
        src.mkdir()
        (src / "f1_OPERATIONS.csv").write_text(
            "order_id,scrap_qty,yield_qty,total_qty\nPO1,1,2,3\nPO2,bad,5,6\n"
        )
        return read_csv_staged(
            spark, str(src), CASE1_TEMPLATES["OPERATIONS"]["source"]
        )

    def test_transform_and_routing(self, spark, tmp_path):
        staged = route_templates(self._staged(spark, tmp_path))
        assert staged.select("template").distinct().collect()[0][0] == "OPERATIONS"
        out = case1_pipeline(staged, "OPERATIONS")
        assert out.columns == CASE1_TEMPLATES["OPERATIONS"]["target"]
        rows = {r["productionOrder"]: r for r in out.collect()}
        assert rows["PO1"]["confirmedActivityScrapQuantity"] == 1
        assert rows["PO2"]["confirmedActivityScrapQuantity"] is None  # coerced

    def test_strict_mode_raises_on_garbage(self, spark, tmp_path):
        staged = self._staged(spark, tmp_path)
        with pytest.raises(Exception, match="CAST_INVALID_INPUT|cannot be cast"):
            case1_pipeline(staged, "OPERATIONS", strict=True).collect()

    def test_end_to_end_sink_roundtrip(self, spark, tmp_path):
        out = case1_pipeline(self._staged(spark, tmp_path), "OPERATIONS")
        sink = str(tmp_path / "result")
        csv_append_sink(out, sink)
        back = spark.read.option("header", "true").csv(sink)
        assert back.count() == 2

    def test_unknown_template_keyerror(self, spark, tmp_path):
        with pytest.raises(KeyError):
            case1_pipeline(self._staged(spark, tmp_path), "NOPE")


class TestStagingOverwrite:
    def test_overwrite_resets(self, spark, tmp_path):
        p = str(tmp_path / "staging")
        staging_overwrite(spark.range(5), p)
        staging_overwrite(spark.range(3), p)
        assert spark.read.parquet(p).count() == 3


class TestJdbcAdapter:
    def test_reader_configs_built(self, spark):
        jdbc = JdbcAdapter(
            url="jdbc:sqlserver://host;databaseName=dw",
            user="u",
            password="p",
            batch_size=777,
            extra_options={"encrypt": "false"},
        )
        # builders must construct without a connection; .load() would dial
        assert jdbc.table_reader(spark, "dbo.Site") is not None
        assert jdbc.query_reader(spark, "SELECT 1 AS x") is not None

    def test_merge_statement_shape(self):
        jdbc = JdbcAdapter(url="jdbc:x")
        sql = jdbc.merge_statement(
            "stage.T", "dbo.T", keys=["id"], columns=["id", "v"]
        )
        assert "MERGE INTO dbo.T" in sql
        assert "t.id = s.id" in sql
        assert "UPDATE SET t.v = s.v" in sql
        assert "INSERT (id, v)" in sql


class TestExcelAdapter:
    def test_stub_raises_without_codec_or_reads(self, spark, tmp_path):
        """Without openpyxl the decode raises NotImplementedError at
        execution; with it, a real xlsx would round-trip. Either way
        the plan itself must build (plumbing is real)."""
        (tmp_path / "x_OPERATIONS.xlsx").write_bytes(b"PK\x03\x04 not a real xlsx")
        df = read_excel_dir(
            spark, str(tmp_path / "*.xlsx"), ["order_id", "scrap_qty"]
        )
        assert [f.name for f in df.schema.fields] == [
            "order_id",
            "scrap_qty",
            "_source_file",
        ]
        with pytest.raises(Exception):  # codec missing or invalid payload
            df.collect()


class TestJsonlStaged:
    def test_staging_types_and_dead_letter(self, spark, tmp_path):
        from concurrent_etl_spark.sources.files import read_jsonl_staged

        p = tmp_path / "data.jsonl"
        p.write_text(
            '{"id": "1", "qty": "10"}\n'
            "this is not json\n"
            '{"id": "2", "qty": "20"}\n'
        )
        df = read_jsonl_staged(spark, str(p), ["id", "qty"]).cache()
        assert dict(df.dtypes)["id"] == "string"
        assert dict(df.dtypes)["qty"] == "string"

        good = df.where(F.col("_corrupt").isNull())
        bad = df.where(F.col("_corrupt").isNotNull())
        assert {r["id"] for r in good.collect()} == {"1", "2"}
        assert bad.count() == 1
        assert "not json" in bad.collect()[0]["_corrupt"]
        df.unpersist()

    def test_numeric_json_values_stage_as_strings(self, spark, tmp_path):
        from concurrent_etl_spark.sources.files import read_jsonl_staged

        p = tmp_path / "nums.jsonl"
        p.write_text('{"id": 7, "qty": 3.5}\n')
        row = read_jsonl_staged(spark, str(p), ["id", "qty"]).collect()[0]
        assert row["id"] == "7" and row["qty"] == "3.5"
