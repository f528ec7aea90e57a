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


def _write_xlsx(path, header, rows, inline=False):
    """Write a minimal valid ECMA-376 xlsx: one worksheet, shared
    strings for text cells (or inline strings when ``inline``),
    plain numeric cells for int/float values. Test-side writer so
    the reader is exercised against an independently-constructed
    package, not its own inverse."""
    import zipfile

    def col_letter(i):
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(65 + r) + s
        return s

    shared: list[str] = []

    from xml.sax.saxutils import escape

    def cell(ref, v):
        if v is None:
            return ""
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if inline:
            return (
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(v)}</t></is></c>"
            )
        if v not in shared:
            shared.append(v)
        return f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>'

    body = []
    for rn, row in enumerate([list(header)] + [list(r) for r in rows], start=1):
        cells = "".join(
            cell(f"{col_letter(ci)}{rn}", v) for ci, v in enumerate(row)
        )
        body.append(f'<row r="{rn}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(
            f'<si><t xml:space="preserve">{escape(s)}</t></si>'
            for s in shared
        )
        + "</sst>"
    )
    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


class TestExcelAdapter:
    COLS = ["order_id", "scrap_qty", "yield_qty", "total_qty"]

    def test_reads_real_xlsx_matching_csv_staged(self, spark, tmp_path):
        """S2 end-to-end: the reference's per-file pd.read_excel loop
        (case_1/NormalETL.py:26) as a distributed binaryFile +
        mapInPandas decode. Two xlsx files (shared-string and
        inline-string encodings, numeric cells) must stage to exactly
        the rows the CSV path stages for the same data."""
        xdir = tmp_path / "xlsx"
        cdir = tmp_path / "csv"
        xdir.mkdir()
        cdir.mkdir()
        data = {
            "a_OPERATIONS": [("PO1", 1, 2, 3), ("PO2", 4, 5, 6)],
            "b_OPERATIONS": [("PO3", 7, 8, 9)],
        }
        for i, (stem, rows) in enumerate(sorted(data.items())):
            _write_xlsx(
                xdir / f"{stem}.xlsx", self.COLS, rows, inline=bool(i % 2)
            )
            (cdir / f"{stem}.csv").write_text(
                ",".join(self.COLS)
                + "\n"
                + "".join(",".join(str(v) for v in r) + "\n" for r in rows)
            )
        xdf = read_excel_dir(spark, str(xdir / "*.xlsx"), self.COLS)
        cdf = read_csv_staged(spark, str(cdir), self.COLS)
        xrows = sorted(
            tuple(r[c] for c in self.COLS) for r in xdf.collect()
        )
        crows = sorted(
            tuple(r[c] for c in self.COLS) for r in cdf.collect()
        )
        assert xrows == crows
        files = {r["_source_file"].rsplit("/", 1)[-1] for r in xdf.collect()}
        assert files == {"a_OPERATIONS.xlsx", "b_OPERATIONS.xlsx"}

    def test_missing_and_extra_columns_project_like_reference(
        self, spark, tmp_path
    ):
        """Sheet missing an expected column -> nulls; extra sheet
        column -> dropped (the df[expected] staging projection)."""
        _write_xlsx(
            tmp_path / "x_OPERATIONS.xlsx",
            ["order_id", "extra_col", "scrap_qty"],
            [("PO9", "junk", 42)],
        )
        df = read_excel_dir(
            spark, str(tmp_path / "*.xlsx"), ["order_id", "scrap_qty", "gone"]
        )
        row = df.collect()[0]
        assert (row["order_id"], row["scrap_qty"], row["gone"]) == (
            "PO9",
            "42",
            None,
        )

    def test_python_datasource_matches_mapinpandas_path(self, spark, tmp_path):
        """spark.read.format('xlsx') (Spark 4 Python DataSource, one
        partition per file) returns the same staged rows as the
        binaryFile+mapInPandas adapter."""
        from concurrent_etl_spark.sources.xlsx_datasource import register

        xdir = tmp_path / "xlsx"
        xdir.mkdir()
        _write_xlsx(
            xdir / "a_OPERATIONS.xlsx", self.COLS, [("PO1", 1, 2, 3)]
        )
        _write_xlsx(
            xdir / "b_OPERATIONS.xlsx", self.COLS, [("PO2", 4, 5, 6)],
            inline=True,
        )
        register(spark)
        via_ds = (
            spark.read.format("xlsx")
            .option("path", str(xdir / "*.xlsx"))
            .option("columns", ",".join(self.COLS))
            .load()
        )
        via_mip = read_excel_dir(spark, str(xdir / "*.xlsx"), self.COLS)
        assert via_ds.schema == via_mip.schema
        assert via_ds.rdd.getNumPartitions() == 2  # one per file
        a = sorted(tuple(r[c] for c in self.COLS) for r in via_ds.collect())
        b = sorted(tuple(r[c] for c in self.COLS) for r in via_mip.collect())
        assert a == b

    def test_property_roundtrip_random_matrices(self, tmp_path):
        """Property check of the vendored SpreadsheetML reader: any
        matrix of strings / ints / floats / None cells written by the
        independent test writer decodes to exactly the expected
        all-string frame, under both shared-string and inline-string
        encodings (XML escaping, sparse rows, unicode)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from concurrent_etl_spark.sources.excel import read_xlsx_bytes

        cell = st.one_of(
            st.none(),
            st.integers(min_value=-10**9, max_value=10**9),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_categories=("Cs", "Cc", "Cn")
                ),
                max_size=12,
            ),
        )

        @settings(max_examples=25, deadline=None)
        @given(
            n_cols=st.integers(min_value=1, max_value=4),
            data=st.data(),
            inline=st.booleans(),
        )
        def check(n_cols, data, inline):
            header = [f"c{i}" for i in range(n_cols)]
            rows = data.draw(
                st.lists(
                    st.lists(cell, min_size=n_cols, max_size=n_cols),
                    max_size=8,
                )
            )
            path = tmp_path / "prop.xlsx"
            _write_xlsx(path, header, rows, inline=inline)
            pdf = read_xlsx_bytes(path.read_bytes())
            assert list(pdf.columns) == header
            got = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
            want = [
                tuple(None if v is None else str(v) for v in r) for r in rows
            ]
            # rows whose cells are ALL None produce no <c> elements; the
            # reader keeps the row only if the writer emitted a <row>
            assert got == want

        check()

    def test_invalid_payload_raises(self, spark, tmp_path):
        """A non-zip payload fails loudly at execution, never silently
        yields rows; the plan itself still builds (plumbing is real)."""
        (tmp_path / "x_OPERATIONS.xlsx").write_bytes(b"PK\x03\x04 not a real xlsx")
        df = read_excel_dir(
            spark, str(tmp_path / "*.xlsx"), ["order_id", "scrap_qty"]
        )
        assert [f.name for f in df.schema.fields] == [
            "order_id",
            "scrap_qty",
            "_source_file",
        ]
        with pytest.raises(Exception):
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


class TestOrcSource:
    def test_roundtrip_and_pushdown(self, spark, tables, tmp_path):
        """ORC round-trips typed data and reaches the scan with
        pushed filters + pruned columns, exactly like the parquet
        path — the assertion that makes it a real engine source, not
        just a writer call."""
        from concurrent_etl_spark.plans.explain import plan_string
        from concurrent_etl_spark.sources.files import read_orc, write_orc

        src = tables["orders"]
        path = str(tmp_path / "orders_orc")
        write_orc(src, path)
        back = read_orc(spark, path)
        assert back.count() == src.count()
        assert [f.name for f in back.schema.fields] == [
            f.name for f in src.schema.fields
        ]
        q = back.where("o_custkey = 7").select("o_orderkey", "o_totalprice")
        plan = plan_string(q, "formatted")
        assert "PushedFilters" in plan and "o_custkey" in plan.split(
            "PushedFilters"
        )[1].split("\n")[0]
        # column pruning: the ORC scan reads only the needed columns
        rs = plan.split("ReadSchema")[1].split("\n")[0]
        assert "o_orderkey" in rs and "o_orderstatus" not in rs
        got = {r["o_orderkey"] for r in q.collect()}
        exp = {
            r["o_orderkey"]
            for r in src.where("o_custkey = 7")
            .select("o_orderkey")
            .collect()
        }
        assert got == exp and got


class TestSchemaEvolutionRead:
    def test_mergeschema_unions_column_sets(self, spark, tmp_path):
        """A table whose files were written under an evolving schema
        (a column added later) reads as the union of column sets with
        nulls for the missing values — the read-side half of
        schema_evolution_union's name-aligned write-side union, and
        the property that lets a 100 TB table add a column without
        rewriting history."""
        path = str(tmp_path / "evolving")
        spark.createDataFrame(
            [(1, "a")], "k int, v string"
        ).write.parquet(path + "/batch=1")
        spark.createDataFrame(
            [(2, "b", 9.5)], "k int, v string, score double"
        ).write.parquet(path + "/batch=2")
        df = spark.read.option("mergeSchema", "true").parquet(path)
        assert sorted(f.name for f in df.schema.fields) == [
            "batch", "k", "score", "v",
        ]
        rows = {r["k"]: (r["v"], r["score"]) for r in df.collect()}
        assert rows == {1: ("a", None), 2: ("b", 9.5)}
