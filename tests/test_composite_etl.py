"""End-to-end case-2 composite: staged batch -> casts -> dim upserts ->
surrogate joins (SURVEY §2.6 + §3 EP3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from concurrent_etl_spark.operators.etl import confirmation_etl
from concurrent_etl_spark.plans.explain import plan_string


@pytest.fixture()
def staged_batch(spark):
    rows = [
        ("PO1", "S1", "10", "1.5", "2024-01-02 00:00:00", "xx 08:00:01"),
        ("PO1", "S2", "20", "2.5", "2024-01-03 00:00:00", "xx 09:00:02"),
        ("PO2", "S1", "bad", "3.5", "garbage", "xx 10:00:03"),
        ("PO3", None, "40", "4.5", "2024-01-05 00:00:00", None),
    ]
    return spark.createDataFrame(
        rows,
        ["productionOrder", "site", "qty", "dur", "postingDate", "postingTime"],
    )


def _empty_dim(spark, id_col):
    return spark.createDataFrame([], f"{id_col} bigint, key string")


class TestConfirmationEtl:
    def test_full_composite(self, spark, staged_batch):
        dims = {
            "productionOrder": spark.createDataFrame(
                [(1, "PO1")], ["productionOrderID", "productionOrder"]
            ),
            "site": spark.createDataFrame([], "siteID bigint, site string"),
        }
        out, updated = confirmation_etl(
            staged_batch,
            dims,
            dim_keys={"productionOrder": "productionOrder", "site": "site"},
            int_cols=["qty"],
            float_cols=["dur"],
            date_cols=["postingDate"],
            time_cols=["postingTime"],
        )
        rows = out.collect()
        assert len(rows) == 4

        po = {r["productionOrder"]: r["productionOrderID"] for r in rows}
        assert po == {"PO1": 1, "PO2": 2, "PO3": 3}  # PO1 kept, new after max

        site = {r["site"]: r["siteID"] for r in rows if r["site"] is not None}
        assert site == {"S1": 1, "S2": 2}
        null_site = [r for r in rows if r["site"] is None][0]
        assert null_site["siteID"] is None  # null keys never get surrogates

        typed = {(r["productionOrder"], r["site"]): r for r in rows}
        bad = typed[("PO2", "S1")]
        assert bad["qty"] is None and bad["postingDate"] is None
        good = typed[("PO1", "S1")]
        assert good["qty"] == 10 and str(good["postingDate"]) == "2024-01-02"
        assert good["postingTime"] == "08:00:01"
        assert math.isclose(good["dur"], 1.5)

        assert updated["productionOrder"].count() == 3

    def test_idempotent_rerun(self, spark, staged_batch):
        dims = {"site": _empty_dim(spark, "siteID").toDF("siteID", "site")}
        _, up1 = confirmation_etl(
            staged_batch, dims, dim_keys={"site": "site"}, int_cols=["qty"]
        )
        _, up2 = confirmation_etl(
            staged_batch, {"site": up1["site"]}, dim_keys={"site": "site"}
        )
        assert sorted(
            (r["siteID"], r["site"]) for r in up2["site"].collect()
        ) == [(1, "S1"), (2, "S2")]

    def test_dim_joins_are_broadcast(self, spark, staged_batch):
        dims = {"site": spark.createDataFrame([(1, "S1")], ["siteID", "site"])}
        out, _ = confirmation_etl(staged_batch, dims, dim_keys={"site": "site"})
        plan = plan_string(out, mode="simple")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestPandasUdfCosine:
    def test_matches_builtin(self, spark):
        from concurrent_etl_spark.operators.similarity import (
            cosine,
            cosine_pandas_udf,
        )

        df = spark.createDataFrame(
            [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]), ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0])],
            ["a", "b"],
        )
        udf_cos = cosine_pandas_udf()
        rows = df.select(
            cosine(F.col("a"), F.col("b")).alias("builtin"),
            udf_cos("a", "b").alias("vectorized"),
        ).collect()
        for r in rows:
            assert math.isclose(r["builtin"], r["vectorized"], rel_tol=1e-12)
