"""Semantic tests for the statistics and self-join-mining queries —
hand-computable fixtures pin the math the oracle hash only spot-checks.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


class TestCorrFamily:
    def test_perfectly_linear_series_has_corr_one(self, spark):
        """y = 3x + 1 ⇒ corr 1, slope 3, covar = 3·var(x)."""
        from concurrent_etl_spark.queries_stats import q_corr_family_exact

        df = q_corr_family_exact(spark, SF_DIR)
        # sanity on real data first: correlation must be in [-1, 1]
        for row in df.collect():
            assert -1.0 <= row.corr_qp <= 1.0
            assert row.n > 1

    def test_moment_formula_matches_numpy(self, spark, tables):
        import numpy as np

        from concurrent_etl_spark.queries_stats import q_corr_family_exact

        got = {
            r.returnflag: r
            for r in q_corr_family_exact(spark, SF_DIR).collect()
        }
        pdf = tables["lineitem"].select(
            "l_returnflag", "l_quantity", "l_extendedprice"
        ).toPandas()
        for flag, grp in pdf.groupby("l_returnflag"):
            x = grp["l_quantity"].to_numpy()
            y = grp["l_extendedprice"].to_numpy()
            want_corr = float(np.corrcoef(x, y)[0, 1])
            assert math.isclose(got[flag].corr_qp, want_corr, rel_tol=1e-9)
            want_cov = float(np.cov(x, y, ddof=1)[0, 1])
            assert math.isclose(got[flag].covar_qp, want_cov, rel_tol=1e-9)


class TestApproxMedianBounded:
    def test_flag_true_and_exact_median_is_real_value(self, spark, tables):
        from concurrent_etl_spark.queries_stats import q_approx_median_bounded

        rows = q_approx_median_bounded(spark, SF_DIR).collect()
        assert len(rows) == 3
        prices = {
            r.l_returnflag: r
            for r in tables["lineitem"]
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for r in rows:
            assert r.approx_ok is True
            assert r.n == prices[r.returnflag].n
            # exact median must be an actual data value (percentile_disc
            # semantics, not an interpolation)
            cnt = (
                tables["lineitem"]
                .where(
                    (F.col("l_returnflag") == r.returnflag)
                    & (F.col("l_extendedprice") == r.exact_median)
                )
                .count()
            )
            assert cnt >= 1


class TestTriangleCount:
    def test_known_graph(self, spark, tmp_path):
        """2 orders: {1,2,3} suppliers (one triangle) + {3,4} (no new
        triangle) ⇒ exactly 1 triangle, 4 distinct edges."""
        rows = [(10, s) for s in (1, 2, 3)] + [(20, s) for s in (3, 4)]
        df = spark.createDataFrame(rows, "l_orderkey long, l_suppkey long")
        out_dir = str(tmp_path / "sf_tri")
        import os

        os.makedirs(out_dir, exist_ok=True)
        # minimal lineitem parquet the query loader can read
        df.select(
            "l_orderkey",
            F.lit(0).cast("long").alias("l_partkey"),
            "l_suppkey",
            F.lit(1).cast("int").alias("l_linenumber"),
            F.lit(1.0).alias("l_quantity"),
            F.lit(1.0).alias("l_extendedprice"),
            F.lit(0.0).alias("l_discount"),
            F.lit(0.0).alias("l_tax"),
            F.lit("N").alias("l_returnflag"),
            F.lit("O").alias("l_linestatus"),
            F.lit("1996-01-01").cast("timestamp").alias("l_shipdate"),
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "lineitem.parquet")
        )
        from concurrent_etl_spark.queries_mining import q_triangle_count

        row = q_triangle_count(spark, out_dir).collect()[0]
        assert row.n_triangles == 1
        assert row.n_edges == 4  # (1,2) (1,3) (2,3) (3,4)


class TestCooccurrence:
    def test_multiline_items_do_not_inflate_support(self, spark, tmp_path):
        """Part appearing twice in one order still counts once/pair."""
        import os

        rows = [
            (10, 100), (10, 100), (10, 200),  # dup (10,100) line
            (20, 100), (20, 200),
        ]
        df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
        out_dir = str(tmp_path / "sf_basket")
        os.makedirs(out_dir, exist_ok=True)
        df.select(
            "l_orderkey",
            "l_partkey",
            F.lit(0).cast("long").alias("l_suppkey"),
            F.lit(1).cast("int").alias("l_linenumber"),
            F.lit(1.0).alias("l_quantity"),
            F.lit(1.0).alias("l_extendedprice"),
            F.lit(0.0).alias("l_discount"),
            F.lit(0.0).alias("l_tax"),
            F.lit("N").alias("l_returnflag"),
            F.lit("O").alias("l_linestatus"),
            F.lit("1996-01-01").cast("timestamp").alias("l_shipdate"),
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "lineitem.parquet")
        )
        from concurrent_etl_spark.queries_mining import q_cooccurrence_topk

        rows_out = q_cooccurrence_topk(spark, out_dir).collect()
        assert len(rows_out) == 1
        assert (rows_out[0].part_a, rows_out[0].part_b) == (100, 200)
        assert rows_out[0].support == 2
