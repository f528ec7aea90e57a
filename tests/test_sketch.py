"""KMV distinct sketch + fixed-point centroid aggregation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from concurrent_etl_spark.operators.sketch import kmv_distinct
from concurrent_etl_spark.operators.similarity import bucket_centroids
from concurrent_etl_spark.plans import plan_string


class TestKMV:
    def test_exact_below_k(self, spark):
        """Groups with < k distinct values report the exact count."""
        df = spark.createDataFrame(
            pd.DataFrame({"g": ["a"] * 100, "v": list(range(50)) * 2})
        )
        row = kmv_distinct(df, "v", group_cols=["g"], k=256).collect()[0]
        assert row.n_kept == 50
        assert row.est_distinct == 50.0

    def test_estimate_within_error_bound(self, spark, tables):
        """sf0.001 orders: estimate within ~4/sqrt(k) of the truth."""
        orders = tables["orders"]
        exact = orders.select("o_custkey").distinct().count()
        est = kmv_distinct(orders, "o_custkey", k=256).collect()[0].est_distinct
        assert est == pytest.approx(exact, rel=4 / 256**0.5)

    def test_partial_window_group_limit(self, spark, tables):
        """The rank<=k filter must run map-side (Partial WindowGroupLimit
        below the shuffle) — the sketch's bounded-state guarantee."""
        df = kmv_distinct(
            tables["orders"], "o_custkey", group_cols=["o_orderpriority"]
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan and "Partial" in plan, plan


class TestCentroids:
    def test_partition_invariance(self, spark, tables):
        """Fixed-point accumulation => identical centroids under any
        partitioning (naive double sums would differ)."""
        emb = tables["embeddings"]
        a = bucket_centroids(emb.repartition(1), n_buckets=4)
        b = bucket_centroids(emb.repartition(13, "vec_id"), n_buckets=4)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_matches_numpy_mean(self, spark):
        """Centroid ≈ numpy mean within the 2^-20 quantization step."""
        import numpy as np

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(40, 8)).astype("float64")
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(40)],
            "vec_id long, embedding array<double>",
        )
        out = {
            (r.bucket, r.dim): r.centroid_val
            for r in bucket_centroids(df, n_buckets=2).collect()
        }
        for b in range(2):
            m = vecs[[i for i in range(40) if i % 2 == b]].mean(axis=0)
            for d in range(8):
                assert out[(b, d)] == pytest.approx(m[d], abs=2**-20)

    def test_shuffle_only_on_group_keys(self, spark, tables):
        """One hash aggregation: partial_count/sum map-side, a single
        exchange on (bucket, dim)."""
        plan = plan_string(
            bucket_centroids(tables["embeddings"]), mode="simple"
        )
        assert plan.count("Exchange") == 1, plan


class TestKmvOverlap:
    def test_exact_when_union_fits_in_k(self, spark):
        """|A|=10, |B|=10, |A∩B|=5: union of 15 < k=256 hashes means
        every estimate collapses to the exact count."""
        from concurrent_etl_spark.operators.sketch import kmv_overlap

        a = spark.createDataFrame([(i,) for i in range(1, 11)], ["v"])
        b = spark.createDataFrame([(i,) for i in range(6, 16)], ["v"])
        r = kmv_overlap(a, b, "v").collect()[0]
        assert r.n_kept == 15
        assert r.est_union == 15.0
        assert r.n_common == 5
        assert abs(r.est_intersect - 5.0) < 1e-9


class TestCmsFrequencySketch:
    def test_never_underestimates_and_min_rule(self, spark):
        from concurrent_etl_spark.queries_llm2 import q_cms_frequency_sketch

        rows = q_cms_frequency_sketch(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 10
        for r in rows:
            assert r["never_underestimates"] is True
            assert r["cms_estimate"] >= r["exact_count"] >= 1

    def test_merge_law_partials_add(self, spark):
        """CMS of (A ∪ B) == cellwise sum of CMS(A) + CMS(B): build
        the sketch with the query's own helpers over two disjoint
        halves and over the union; cells add."""
        import pandas as pd
        from concurrent_etl_spark.queries_llm2 import cms_cells
        from concurrent_etl_spark.operators.text import tokens
        from pyspark.sql import functions as F

        def cells(df):
            tok_counts = (
                df.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
                .groupBy("tok")
                .agg(F.count("*").alias("exact_count"))
            )
            return {
                (r["i"], r["bucket"]): r["cell_count"]
                for r in cms_cells(tok_counts).collect()
            }

        docs = [(i, f"tok{i % 5} tok{i % 3} common") for i in range(40)]
        pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
        ca = cells(spark.createDataFrame(pdf[:20]))
        cb = cells(spark.createDataFrame(pdf[20:]))
        cu = cells(spark.createDataFrame(pdf))

        keys = set(ca) | set(cb)
        assert set(cu) == keys
        for k in keys:
            assert ca.get(k, 0) + cb.get(k, 0) == cu[k]
