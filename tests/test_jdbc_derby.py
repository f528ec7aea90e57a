"""JDBC adapter behavior tests against embedded Apache Derby.

Round 1 verified the adapter only to the option level (no live DB in
the sandbox). Derby ships inside PySpark's own jars directory, so an
in-memory database (``jdbc:derby:memory:...``) gives a REAL JDBC
round-trip in-process: these tests prove the reads/writes the options
configure actually happen — full-table read (S3), server-side
pushdown query (S4), batched append (S7), truncate-overwrite (S8),
and a genuine SQL MERGE executed target-side (S9), matching
case_2/Normal.py:58,74,253-257,277,285-286 semantics.

Derby folds unquoted identifiers to uppercase while Spark's JDBC
writer quotes column names verbatim, so the test schemas use
uppercase column names — the same portability rule a real warehouse
deployment follows.
"""

from __future__ import annotations

import os

import pytest

import pyspark
from concurrent_etl_spark.sources.jdbc import JdbcAdapter

_JARS = os.path.join(os.path.dirname(pyspark.__file__), "jars")
derby_available = any(
    f.startswith("derby") and f.endswith(".jar") for f in os.listdir(_JARS)
)

pytestmark = pytest.mark.skipif(
    not derby_available, reason="no Derby jar in the Spark classpath"
)


def _url(db: str, create: bool = False) -> str:
    return f"jdbc:derby:memory:{db}" + (";create=true" if create else "")


class TestDerbyRoundTrip:
    def test_batched_append_then_full_table_read(self, spark):
        """S7 + S3: write 100 rows with a 7-row JDBC batch size, read
        the table back through the adapter, values identical."""
        adapter = JdbcAdapter(url=_url("rt", create=True), batch_size=7)
        df = spark.range(100).selectExpr(
            "id AS ID", "cast(id * 1.5 as double) AS V"
        )
        adapter.write_append(df, "FACTS")
        back = JdbcAdapter(url=_url("rt")).read_table(spark, "FACTS")
        assert sorted((r["ID"], r["V"]) for r in back.collect()) == [
            (i, i * 1.5) for i in range(100)
        ]

    def test_pushdown_query_executes_remotely(self, spark):
        """S4: the query text runs ON the database — proven by using
        Derby-only FETCH FIRST syntax that Spark SQL would reject if
        it tried to parse/execute the query itself."""
        adapter = JdbcAdapter(url=_url("push", create=True))
        df = spark.range(50).selectExpr("id AS ID")
        adapter.write_append(df, "T")
        out = JdbcAdapter(url=_url("push")).read_query(
            spark,
            "SELECT ID FROM T WHERE ID >= 10 "
            "ORDER BY ID DESC FETCH FIRST 5 ROWS ONLY",
        )
        assert sorted(r["ID"] for r in out.collect()) == [45, 46, 47, 48, 49]

    def test_overwrite_truncate_resets_staging(self, spark):
        """S8: two appends then a truncate-overwrite leaves exactly
        the final batch — the reference's DELETE-then-INSERT staging
        reset as one atomic option."""
        adapter = JdbcAdapter(url=_url("stg", create=True), batch_size=10)
        first = spark.range(30).selectExpr("id AS ID")
        adapter.write_append(first, "STAGE")
        adapter.write_append(first, "STAGE")
        assert (
            JdbcAdapter(url=_url("stg")).read_table(spark, "STAGE").count()
            == 60
        )
        final = spark.range(5).selectExpr("id + 100 AS ID")
        adapter.write_overwrite_truncate(final, "STAGE")
        back = JdbcAdapter(url=_url("stg")).read_table(spark, "STAGE")
        assert sorted(r["ID"] for r in back.collect()) == [
            100, 101, 102, 103, 104,
        ]

    def test_stream_to_warehouse_merge_daemon(self, spark, tmp_path):
        """The reference's full daemon shape (watch dir -> stage ->
        server-side MERGE, case_2/Normal.py:276-286,300-331) end to
        end against a real database: a file stream feeds foreachBatch,
        each batch truncate-loads a Derby staging table and executes
        the generated MERGE into the target; a second wave updates one
        key and inserts another, and the target holds exactly the
        last-writer state."""
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [StructField("ID", LongType()), StructField("VAL", StringType())]
        )
        src = tmp_path / "sample"
        src.mkdir()
        (src / "w1.csv").write_text("ID,VAL\n1,a\n2,b\n")
        adapter = JdbcAdapter(url=_url("daemon", create=True))
        # target must exist before the first MERGE: seed an empty table
        adapter.write_append(
            spark.createDataFrame([], "ID bigint, VAL string"), "TGT"
        )

        def handle(batch, batch_id):
            if batch.isEmpty():
                return
            adapter.write_overwrite_truncate(batch.select("ID", "VAL"), "STG")
            adapter.execute(
                spark,
                adapter.merge_statement(
                    "STG", "TGT", keys=["ID"], columns=["ID", "VAL"]
                ).rstrip(";"),
            )

        def run_wave():
            q = (
                spark.readStream.format("csv")
                .schema(schema)
                .option("header", "true")
                .load(str(src))
                .writeStream.foreachBatch(handle)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_wave()
        tgt = JdbcAdapter(url=_url("daemon"))
        assert sorted(
            (r["ID"], r["VAL"]) for r in tgt.read_table(spark, "TGT").collect()
        ) == [(1, "a"), (2, "b")]

        (src / "w2.csv").write_text("ID,VAL\n2,b2\n3,c\n")
        run_wave()
        assert sorted(
            (r["ID"], r["VAL"]) for r in tgt.read_table(spark, "TGT").collect()
        ) == [(1, "a"), (2, "b2"), (3, "c")]

    def test_merge_statement_upserts_target_side(self, spark):
        """S9: stage rows over JDBC, execute the generated MERGE on
        the database, verify matched rows updated and new rows
        inserted — the stored-procedure delegation the reference
        fired blindly, observed end-to-end."""
        adapter = JdbcAdapter(url=_url("mrg", create=True))
        target = spark.createDataFrame(
            [(1, "a"), (2, "b")], "ID bigint, VAL string"
        )
        adapter.write_append(target, "TGT")
        staging = spark.createDataFrame(
            [(2, "b2"), (3, "c")], "ID bigint, VAL string"
        )
        adapter.write_append(staging, "STG")
        sql = adapter.merge_statement(
            "STG", "TGT", keys=["ID"], columns=["ID", "VAL"]
        ).rstrip(";")
        n = adapter.execute(spark, sql)
        assert n == 2  # one update + one insert
        back = JdbcAdapter(url=_url("mrg")).read_table(spark, "TGT")
        assert sorted((r["ID"], r["VAL"]) for r in back.collect()) == [
            (1, "a"),
            (2, "b2"),
            (3, "c"),
        ]
